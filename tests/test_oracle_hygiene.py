"""Oracle-string hygiene guard (r6).

`dq()` normalizes oracle SQL with `" ".join(sql.split())`, which
collapses newlines — a `--` line comment anywhere would swallow the
REST OF THE QUERY and DuckDB would see a silently different statement
(the r5 near-miss class recorded in the determinism conventions). Ban
`--` outright in oracle strings; SQL has no other use for it here
(subtraction never needs adjacent dashes)."""

from __future__ import annotations

from vcf2db_spark.queries import ORACLES


def test_no_line_comments_in_oracle_sql():
    offenders = [name for name, sql in ORACLES.items() if "--" in sql]
    assert not offenders, (
        f"oracle strings containing '--' (whitespace collapse turns the "
        f"rest of the query into one comment): {offenders}"
    )

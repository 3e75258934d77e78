"""vcf2db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of quinlan-lab/vcf2db (see SURVEY.md).

Layers
------
- ``sources``   : VCF/PED readers, header→StructType inference (SURVEY §2A A1/A2/A9)
- ``operators`` : impacts explode + severity ranking, dedup, similarity,
                  interval joins (SURVEY §2A A6/A7, §2C)
- ``functions`` : codec UDFs, vector math, text analysis (SURVEY §2A A8, §2C)
- ``queries``   : the declared-query registry backing ``__spark_entry__``
- ``sinks``     : JDBC / parquet writers (SURVEY §2A A10)
- ``streaming`` : Structured Streaming variants (SURVEY §2C C7-C11)
"""

__version__ = "0.1.0"

# One BLAS thread per process, defaulted BEFORE numpy first loads (the
# OpenBLAS/MKL pool size is read at library init, so this must precede
# any submodule's ``import numpy``). Rationale (optimization guide §4.5 /
# §2.6): every Python worker is already one task-parallel slot of
# local[N] — letting BLAS spin its own cpu_count() pool inside EACH of N
# concurrent workers oversubscribes N×N threads; and on the DRIVER the
# batched tiny GEMMs of PQ/OPQ training pay the pool's fork/sync
# overhead per call (measured: opq_train m=32 k=128 1.5–2.2 s unpinned →
# 0.30 s pinned; ivfadc_recall −27% at sf0.1). ``setdefault``: callers
# who want a fat multi-threaded BLAS export their own value; a cluster
# whose executors run fewer workers than cores sets
# SPARK_GRAFT_BLAS_THREADS accordingly. Workers inherit the variable
# from the launcher env in local mode; ``session.get_spark`` re-applies
# it per-executor for cluster deployments.
import os as _os

_blas = _os.environ.get("SPARK_GRAFT_BLAS_THREADS", "1")
for _var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_var, _blas)
del _os, _blas, _var

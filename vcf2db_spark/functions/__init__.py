from vcf2db_spark.functions.codecs import pack_blob_udf, unpack_blob_udf

__all__ = ["pack_blob_udf", "unpack_blob_udf"]

from tinyetl_spark.lake.table import LakeTable, Snapshot  # noqa: F401
from tinyetl_spark.lake.merge import merge_apply, MergeStats  # noqa: F401
from tinyetl_spark.lake.dml import delete_where, update_where  # noqa: F401

from openlogparse_spark.parse.stage import parse_stage, merge_row_pieces, MASK_SQL_EXPR  # noqa: F401
from openlogparse_spark.parse.drain import DrainMiner, mine_templates  # noqa: F401

"""Oracle-checked query definitions (SURVEY.md §2.2 inventory).

Importing this package registers every query into
``plc_data_etl_pipeline_spark.registry``. Modules:

* relational   — projection/filter + flagship rollup
* joins        — inner/left/semi/anti/range/as-of/multiway
* aggregates   — basic/distinct/stats/rollup/cube/approx
* windows      — rank/lag-lead/running/moving frames
* sort_set     — sort/limit/top-k, union/intersect/except
* scalars      — string/date/math/JSON/array functions
* stream_batch — batch-expressible event-time windows (tumbling/sliding/session)
* extensions   — dedup / similarity / text analysis / multimodal
* parity       — reference-pipeline parity queries (sink roundtrip, UDF path)
"""

from . import (  # noqa: F401
    advanced,
    aggregates,
    extensions,
    joins,
    parity,
    relational,
    scalars,
    sort_set,
    stream_batch,
    windows,
)

"""Oracle-checked query definitions (SURVEY.md §2.2 inventory; full
generated listing in QUERIES.md at the repo root).

Importing this package registers every query into
``plc_data_etl_pipeline_spark.registry``. Modules:

* relational   — projection/filter + flagship rollup
* joins        — inner/left/right/full/cross/semi/anti/range/as-of/multiway
* aggregates   — basic/distinct/stats/rollup/cube/grouping-sets/approx
* windows      — rank/lag-lead/running/moving/range-interval frames
* sort_set     — sort/limit/top-k, union/intersect/except/distinct
* scalars      — string/date/math/JSON/array/map functions, (pos)explode
* advanced     — pivot, subqueries, SQL CTEs, CSV/JSON source round-trips
* stream_batch — batch-expressible event-time windows (tumbling/sliding/session)
* timeseries   — gap fill / LOCF interpolation / deterministic mode
* tpch_shapes  — classic decision-support shapes (Q2/Q7/Q8/Q10/Q13-Q19/Q22)
* extensions   — dedup / similarity / text analysis / multimodal
* parity       — reference-pipeline parity queries (avro, sink, UDF paths)
"""

from . import (  # noqa: F401
    advanced,
    aggregates,
    curation,
    events,
    extensions,
    graph,
    joins,
    parity,
    relational,
    scalars,
    sort_set,
    stream_batch,
    timeseries,
    tpch_shapes,
    windows,
)

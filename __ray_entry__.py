"""Driver contract for the Ray-Data spatial engine.

``queries()`` exposes one callable per implemented operator family
(SURVEY.md par.2), each taking ``sf_dir`` and returning an Arrow table /
pandas DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent SQL over
the same parquet views for every SQL-expressible query.

Spatial queries run over a FROZEN deterministic synthetic raster (the
"oracle grid") whose values are integer-derived, so the DuckDB oracle
reproduces the engine's float32->float64 arithmetic bit-exactly from
``range()`` -- no external data, any scale factor.  Web-page and media
pipelines (non-SQL-expressible) are exercised by ``entry()`` and the
pytest suite instead.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from tiff_to_geojson_csv_json_format_converter_ray.queries import (  # noqa: F401
    _REGISTRY_HEAD,
    entry,
    oracle_sql,
    queries,
)

# fixture helpers the test suite reaches through this module
from tiff_to_geojson_csv_json_format_converter_ray.queries.part01 import (  # noqa: F401,E402
    _og_multiband_tiles_table,
    _og_tiles_table,
)
from tiff_to_geojson_csv_json_format_converter_ray.queries.part08 import (  # noqa: F401,E402
    _st_run_sum,
)

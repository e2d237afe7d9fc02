from .io import (  # noqa: F401
    read_csv,
    read_parquet,
    write_csv,
    write_parquet,
    write_jdbc,
    read_jdbc,
    range_source,
)
from .pydatasource import (  # noqa: F401
    SynthDocsDataSource,
    register_synth_docs,
)

"""File-layer sources/sinks: the ``.bro`` streaming block codec
(capability parity with the reference Hadoop Brotli codec) and its
Spark DataFrame integration."""

from .bro_codec import (  # noqa: F401
    Bro2Writer,
    BroConfig,
    BroCorruptError,
    get_backend,
    is_bro2_file,
    read_bro2_block,
    read_bro2_index,
    read_bro_bytes,
    write_bro2_bytes,
    write_bro_bytes,
)
from .bro_spark import read_bro_text, write_bro_text  # noqa: F401

"""File-layer sources/sinks: the ``.bro`` streaming block codec
(capability parity with the reference Hadoop Brotli codec) and its
Spark DataFrame integration."""

from .bro_codec import (  # noqa: F401
    BroConfig,
    BroCorruptError,
    get_backend,
    read_bro_bytes,
    write_bro_bytes,
)
from .bro_spark import read_bro_text, write_bro_text  # noqa: F401

from __future__ import annotations

import pytest

from hadoop_brotli_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hbs-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


# Hypothesis depth control: the in-file @settings(max_examples=6) keeps
# CI fast; HYPOTHESIS_PROFILE=deep multiplies examples for long
# adversarial hunts (used in round-end validation).
try:
    from hypothesis import settings as _hyp_settings

    _hyp_settings.register_profile("default", max_examples=6)
    _hyp_settings.register_profile("deep", max_examples=40)
    import os as _os

    _hyp_settings.load_profile(_os.environ.get("HYPOTHESIS_PROFILE", "default"))
except ImportError:  # pragma: no cover
    pass

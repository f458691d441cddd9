"""Version sync test mirroring reference ``tests/test_version.py``."""

import pathlib
import re

import differt2d_tpu


def test_version_matches_pyproject():
    pyproject = (
        pathlib.Path(__file__).parent.parent / "pyproject.toml"
    ).read_text()
    match = re.search(r'^version = "(.+)"$', pyproject, re.MULTILINE)
    assert match is not None
    assert differt2d_tpu.__version__ == match.group(1)

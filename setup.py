"""Build hook: compile the native candidate enumerator at install time.

The prebuilt binary is deliberately NOT committed to version control; it
is compiled here from ``native/enumerate.cc`` (via ``native/Makefile``)
so every artifact is reproducible from source. When no C++ toolchain is
available the build is skipped and the package falls back to the NumPy
candidate decoder (see ``differt2d_tpu/rt/_native.py``).
"""

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildNativeThenPy(build_py):
    def run(self):
        root = Path(__file__).parent
        makefile = root / "native" / "Makefile"
        if makefile.exists() and shutil.which("make") and shutil.which("g++"):
            try:
                subprocess.run(
                    ["make", "-C", str(makefile.parent)], check=True
                )
            except subprocess.CalledProcessError:
                print(
                    "warning: native enumerator build failed;"
                    " falling back to the NumPy decoder"
                )
        super().run()


setup(cmdclass={"build_py": BuildNativeThenPy})

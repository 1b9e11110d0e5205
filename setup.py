"""Native-library build hook (metadata lives in pyproject.toml).

The C++ decode/encode library (csrc/decode.cpp) is compiled here at package
time so a wheel always carries a binary built from the sources it ships
alongside — never a stale or wrong-platform blob — and the wheel is tagged
for the build platform rather than py3-none-any (the .so is platform code;
an "any" wheel would install a linux ELF on macOS and fail at first decode).

Set ESF_SKIP_NATIVE=1 to package without the library (e.g. no FFmpeg dev
headers on the build host); video decode then rebuilds lazily on first use
from an sdist/source checkout, or raises a plain-language error on wheels.
"""

import os
import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution

ROOT = os.path.dirname(os.path.abspath(__file__))
SO_REL = os.path.join("efficient_slowfast_tpu", "data", "libesf_decode.so")


class build_py_with_native(build_py):
    def run(self):
        super().run()
        # a pre-existing tree .so must never reach the wheel: make is
        # timestamp-driven and would consider a stale/wrong-platform binary
        # up to date (the exact failure decoder.get_lib works around at
        # runtime), and package-data has already copied it into build_lib
        dst = os.path.join(self.build_lib, SO_REL)
        for p in (os.path.join(ROOT, SO_REL), dst):
            if os.path.exists(p):
                os.remove(p)
        csrc = os.path.join(ROOT, "csrc")
        try:
            subprocess.run(["make", "-C", csrc], check=True)
        except Exception as e:
            if os.environ.get("ESF_SKIP_NATIVE") == "1":
                print(
                    "WARNING: skipping native decoder build "
                    f"(ESF_SKIP_NATIVE=1; build error: {e}). Video decode "
                    "will rebuild lazily from csrc/ or raise at first use.",
                    file=sys.stderr,
                )
                return
            raise RuntimeError(
                "building the native decoder failed — install g++ and the "
                "FFmpeg dev libraries (libavformat/libavcodec/libswscale/"
                "libavutil + pkg-config), or set ESF_SKIP_NATIVE=1 to "
                "package without it"
            ) from e
        src = os.path.join(ROOT, SO_REL)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)


class BinaryDistribution(Distribution):
    def has_ext_modules(self):  # platform-tag the wheel (ships a .so)
        return True


setup(
    cmdclass={"build_py": build_py_with_native},
    distclass=BinaryDistribution,
)

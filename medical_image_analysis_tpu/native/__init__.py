"""Native (C++) eval helpers with build-on-demand.

Builds ``_native.cpp`` into a CPython extension the first time it is
imported (g++ direct invocation; no pybind11 needed). Falls back to the
pure-Python implementations in :mod:`..evalx` when compilation is
unavailable.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))


def _build() -> str:
    src = os.path.join(_HERE, "_native.cpp")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_HERE, "_native" + ext)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


_build()

from ._native import ngram_clip_counts, ptb_tokenize_batch  # noqa: E402,F401

"""Build the --py-files zip of this package (spark-submit / addPyFile)."""

from __future__ import annotations

import os
import zipfile


def build_pyfiles_zip(out_path: str) -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(os.path.abspath(out_path))
    if parent:
        os.makedirs(parent, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_root))
                    zf.write(full, rel)
    return out_path

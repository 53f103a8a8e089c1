"""File resolver (src/core/fresolver.cpp analog): ordered search paths for
scene-relative assets, used by the XML loader and test fixtures
(src/python/python/test/util.py ``fresolver_append_path``)."""
from __future__ import annotations

import contextlib
import os
from typing import List


class FileResolver:
    def __init__(self):
        self.paths: List[str] = [os.getcwd()]

    def append(self, path: str):
        self.paths.append(path)

    def prepend(self, path: str):
        self.paths.insert(0, path)

    def resolve(self, name: str) -> str:
        if os.path.isabs(name) and os.path.exists(name):
            return name
        for p in self.paths:
            cand = os.path.join(p, name)
            if os.path.exists(cand):
                return cand
        return name

    def __contains__(self, path: str):
        return path in self.paths


_resolver = FileResolver()


def file_resolver() -> FileResolver:
    """mi.file_resolver() analog."""
    return _resolver


@contextlib.contextmanager
def fresolver_append_path(path: str):
    """Test fixture analog (test/util.py:23): temporarily add a path."""
    _resolver.append(path)
    try:
        yield _resolver
    finally:
        _resolver.paths.remove(path)

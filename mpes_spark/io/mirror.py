"""Storage mirroring — the ``CopyTool`` analog
(``/root/reference/mpes/mirrorutil.py:13-157``): stage acquisition
folders from slow/remote storage onto fast scratch before processing,
skip what is already mirrored, refuse to overfill the target, and
clean the scratch up afterwards.

Driver-side infra by design: file mirroring is I/O-bound OS work, so
the unit of concurrency is a thread (the reference reaches the same
conclusion via dask's ``scheduler='threads'``), not a Spark task —
executors enter the picture only after the data is columnar. The
Spark-native path for *tabular* data is ``write_table`` /
``convert_to_parquet``; this tool exists for the raw-acquisition tree
that precedes it.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass


@dataclass
class CopyTool:
    """Mirror trees under ``source`` into the same relative layout
    under ``dest``.

    ``safety_margin`` bytes must remain free on the target after the
    copy (the reference defaults to a fixed headroom for shared
    scratch); ``ntasks`` bounds concurrent file copies. A file is
    skipped when the mirrored copy already exists with the same size
    and an mtime at least as new (re-copy with ``force=True``)."""

    source: str
    dest: str
    ntasks: int = 25
    safety_margin: int = 1 * 2**30

    def _target_dir(self, sdir: str) -> str:
        rel = os.path.relpath(os.path.realpath(sdir), os.path.realpath(self.source))
        if rel.startswith(os.pardir):
            raise ValueError(f"{sdir!r} is not under source {self.source!r}")
        return os.path.normpath(os.path.join(self.dest, rel))

    def _plan(self, src: str) -> tuple[str, str, list[tuple[str, str]]]:
        if os.path.isfile(src):
            sdir = os.path.dirname(os.path.realpath(src))
            ddir = self._target_dir(sdir)
            pairs = [(src, os.path.join(ddir, os.path.basename(src)))]
        elif os.path.isdir(src):
            sdir = src
            ddir = self._target_dir(sdir)
            pairs = []
            for path, _dirs, files in os.walk(sdir):
                for f in files:
                    sp = os.path.join(path, f)
                    dp = os.path.join(ddir, os.path.relpath(sp, sdir))
                    pairs.append((sp, dp))
        else:
            raise FileNotFoundError(src)
        return sdir, ddir, pairs

    @staticmethod
    def _fresh(sp: str, dp: str) -> bool:
        try:
            s, d = os.stat(sp), os.stat(dp)
        except FileNotFoundError:
            return False
        return d.st_size == s.st_size and d.st_mtime >= s.st_mtime

    def copy(self, src: str, force: bool = False) -> str:
        """Mirror ``src`` (file or tree) and return the target
        directory. Raises ``OSError`` when the copy would leave less
        than ``safety_margin`` free on the destination volume."""
        _sdir, ddir, pairs = self._plan(src)
        todo = [(s, d) for s, d in pairs if force or not self._fresh(s, d)]
        os.makedirs(ddir, exist_ok=True)
        if todo:
            need = sum(os.path.getsize(s) for s, _ in todo)
            free = shutil.disk_usage(ddir).free
            if free - need < self.safety_margin:
                raise OSError(
                    f"not enough space on {self.dest!r}: need {need} B + "
                    f"{self.safety_margin} B margin, have {free} B free"
                )

        def _one(pair: tuple[str, str]) -> None:
            s, d = pair
            os.makedirs(os.path.dirname(d), exist_ok=True)
            shutil.copy2(s, d)  # copy2 keeps mtime -> _fresh works later

        with ThreadPoolExecutor(max_workers=max(1, self.ntasks)) as pool:
            list(pool.map(_one, todo))
        return ddir

    def size(self, src: str) -> tuple[int, int]:
        """(bytes at source, bytes already mirrored) for ``src``."""
        _sdir, _ddir, pairs = self._plan(src)
        at_src = sum(os.path.getsize(s) for s, _ in pairs)
        at_dst = sum(
            os.path.getsize(d) for _, d in pairs if os.path.exists(d)
        )
        return at_src, at_dst

    def cleanup_target(self, src: str) -> None:
        """Remove the mirror of ``src`` from the scratch side (never
        touches the source tree)."""
        _sdir, ddir, _pairs = self._plan(src)
        real_dest = os.path.realpath(self.dest)
        real_ddir = os.path.realpath(ddir)
        if not (real_ddir == real_dest or real_ddir.startswith(real_dest + os.sep)):
            raise ValueError(f"refusing to remove {ddir!r}: outside {self.dest!r}")
        if os.path.isdir(ddir):
            shutil.rmtree(ddir)

"""File-backed key cache keyed by parameter-set name.

Re-design of the reference's test-fixture key cache
(tfhe/src/keycache/mod.rs:1-60 — generic FileStorage/ImplKeyCache with fs2
file locks): keys are generated once per named parameter set and shared by
every test/process via the serialization module.  Locking uses an atomic
O_EXCL lock file (portable, no fs2 dependency).
"""
from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Callable

from . import serialization


class KeyCache:
    def __init__(self, root: str = "keys_cache"):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._mem = {}

    def _path(self, name: str) -> Path:
        return self.root / f"{name}.npz"

    def get(self, name: str, generate: Callable[[], object]):
        """Return cached keys for `name`, generating (under a lock) if absent."""
        if name in self._mem:
            return self._mem[name]
        path = self._path(name)
        lock = path.with_suffix(".lock")
        for _ in range(600):
            if path.exists():
                obj = serialization.load(path)
                self._mem[name] = obj
                return obj
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                # a process killed inside generate() leaves its lock behind;
                # the lock records the owner pid — break it if the owner died.
                # Breaking must be atomic: rename the suspect lock aside and
                # re-verify the renamed file before discarding, so two waiters
                # can never both "break" and leave one unlinking the other's
                # freshly acquired live lock (read-check-unlink TOCTOU).
                try:
                    owner = int(lock.read_text().strip() or "0")
                except (OSError, ValueError):
                    owner = 0
                if owner and not os.path.exists(f"/proc/{owner}"):
                    claimed = lock.with_suffix(f".stale.{os.getpid()}")
                    try:
                        os.rename(lock, claimed)
                    except OSError:
                        pass  # another waiter broke it first
                    else:
                        try:
                            owner2 = int(claimed.read_text().strip() or "0")
                        except (OSError, ValueError):
                            owner2 = 0
                        if owner2 and os.path.exists(f"/proc/{owner2}"):
                            # raced: we renamed a LIVE lock — restore it
                            os.rename(claimed, lock)
                        else:
                            os.unlink(claimed)
                time.sleep(1.0)
                continue
            os.write(fd, str(os.getpid()).encode())
            try:
                obj = generate()
                # per-pid tmp name: concurrent generators (possible only if
                # a lock was wrongly broken) at worst duplicate work — they
                # can never interleave writes into one tmp file and publish
                # a truncated npz
                tmp = path.with_suffix(f".tmp.{os.getpid()}.npz")
                serialization.save(obj, tmp, compress=False)
                os.replace(tmp, path)
                self._mem[name] = obj
                return obj
            finally:
                os.close(fd)
                try:
                    os.unlink(lock)
                except FileNotFoundError:
                    pass
        raise TimeoutError(f"key cache lock for {name} never released")

    def clear(self):
        self._mem.clear()
        for f in self.root.glob("*.npz"):
            f.unlink()

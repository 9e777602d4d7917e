"""Codebase backup at train start (reproducibility aid).

Parity with /root/reference/utils/backup_files.py:47-63: copies whitelisted
source dirs into <output>/backup, gzipping large files.
"""
from __future__ import annotations

import gzip
import os
import shutil
import threading

WHITELIST = ("sgv3d_tpu", "tools", "tests", "bench.py", "__graft_entry__.py")
GZIP_THRESHOLD = 256 * 1024


def _copy_file(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.getsize(src) > GZIP_THRESHOLD:
        with open(src, "rb") as f_in, gzip.open(dst + ".gz", "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
    else:
        shutil.copyfile(src, dst)


def backup_codebase(backup_dir: str, repo_root: str | None = None,
                    blocking: bool = True) -> threading.Thread:
    """Copy the whitelisted source tree into backup_dir.

    Blocking by default, like the reference's synchronous backup_codebase
    (/root/reference/utils/backup_files.py:60-63) — a fire-and-forget
    daemon thread can be killed mid-gzip by a fast crash/exit, silently
    truncating the very snapshot meant to make the run reproducible.
    `blocking=False` opts back into the background copy."""
    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def work():
        for entry in WHITELIST:
            src = os.path.join(repo_root, entry)
            if os.path.isfile(src):
                _copy_file(src, os.path.join(backup_dir, entry))
            elif os.path.isdir(src):
                for root, _dirs, files in os.walk(src):
                    if "__pycache__" in root:
                        continue
                    for name in files:
                        if name.endswith((".pyc", ".so")):
                            continue
                        s = os.path.join(root, name)
                        rel = os.path.relpath(s, repo_root)
                        _copy_file(s, os.path.join(backup_dir, rel))

    t = threading.Thread(target=work, daemon=True)
    t.start()
    if blocking:
        t.join()
    return t

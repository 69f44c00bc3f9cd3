"""Garbage-collect accumulated resumable state (graph shards + BSP
checkpoints) under the local state roots.

Per-job, in-run checkpoint GC already prunes old superstep rounds; what
accumulates across jobs/rounds is whole graph/checkpoint DIRECTORIES keyed
by (query, sf_dir, params) cache keys — each deliberately persistent so a
rerun resumes, but unbounded over weeks. Policy here: a state dir is
collectable when its NEWEST file is older than --max-age-hours (default 24)
— i.e. nothing has read-extended or written it recently. URI roots
(s3://…) are out of scope: use the store's lifecycle policies.

Usage:
  python tools/gc_state.py --dry-run          # list what would go
  python tools/gc_state.py                    # delete, print reclaimed MB
  python tools/gc_state.py --max-age-hours 2
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def newest_mtime(root: str) -> float:
    newest = 0.0
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(dirpath, f)))
            except OSError:
                pass
    return newest or os.path.getmtime(root)


def dir_size(root: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> int:
    from raylink.pipelines import GRAPH_ROOT
    from raylink.superstep import CKPT_ROOT

    ap = argparse.ArgumentParser()
    ap.add_argument("--max-age-hours", type=float, default=24.0)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--roots", nargs="*", default=None,
                    help="override the state roots to scan")
    args = ap.parse_args()

    roots = args.roots or [GRAPH_ROOT, CKPT_ROOT]
    cutoff = time.time() - args.max_age_hours * 3600
    reclaimed = n = 0
    for root in roots:
        if "://" in root or not os.path.isdir(root):
            continue
        for name in sorted(os.listdir(root)):
            d = os.path.join(root, name)
            if not os.path.isdir(d):
                continue
            if newest_mtime(d) >= cutoff:
                continue
            sz = dir_size(d)
            print(f"{'would remove' if args.dry_run else 'removing'} "
                  f"{d} ({sz / 1e6:.1f} MB)")
            if not args.dry_run:
                shutil.rmtree(d, ignore_errors=True)
            reclaimed += sz
            n += 1
    print(f"{'would reclaim' if args.dry_run else 'reclaimed'} "
          f"{reclaimed / 1e6:.1f} MB across {n} state dirs")
    return 0


if __name__ == "__main__":
    sys.exit(main())

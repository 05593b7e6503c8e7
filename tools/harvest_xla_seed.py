"""Harvest XLA persistent-compile-cache entries into the committed seed.

The AOT jax.export artifacts (kernel_artifacts/*.jaxexp.gz) skip *tracing*,
but a fresh clone still pays the Mosaic/XLA backend compile on each
kernel's first call — 625 s for the Ant4Rooms bench stage in round 4
(BENCH_r04 stage_s), because .jax_cache/ is gitignored.  This tool closes
that gap: run the bench against an EMPTY cache dir so it contains exactly
the bench working set, then gzip those compiled-executable entries into
``kernel_artifacts/xla_seed/`` (committed).  bench.py decompresses them
into the live cache at startup, so a fresh clone's first call is a
persistent-cache hit (seconds) instead of a backend compile (minutes).

Usage (on the TPU box)::

    BENCH_CACHE_DIR=/tmp/bench_fresh_cache python bench.py
    python tools/harvest_xla_seed.py /tmp/bench_fresh_cache

Entries are content-keyed by XLA (filename = cache key over module +
compile options + backend version); a key the driver box's runtime doesn't
reproduce is simply never requested — seeding can't corrupt, only miss.
"""

import glob
import gzip
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED_DIR = os.path.join(REPO, "kernel_artifacts", "xla_seed")


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit("usage: harvest_xla_seed.py <fresh-cache-dir>\n"
                 "(run bench.py with BENCH_CACHE_DIR=<fresh-cache-dir> "
                 "first so the dir holds exactly the bench working set)")
    src_dir = sys.argv[1]
    entries = [p for p in glob.glob(os.path.join(src_dir, "*"))
               if os.path.isfile(p)]
    if not entries:
        sys.exit(f"no cache entries in {src_dir}")
    os.makedirs(SEED_DIR, exist_ok=True)
    # replace the previous seed wholesale: stale-fingerprint entries would
    # never be requested again but would bloat the checkout forever
    for old in glob.glob(os.path.join(SEED_DIR, "*.gz")):
        os.remove(old)
    total_raw = total_gz = 0
    for src in sorted(entries):
        dst = os.path.join(SEED_DIR, os.path.basename(src) + ".gz")
        with open(src, "rb") as f, gzip.open(dst, "wb", compresslevel=6) as g:
            shutil.copyfileobj(f, g)
        total_raw += os.path.getsize(src)
        total_gz += os.path.getsize(dst)
        print(f"  {os.path.basename(src)}: "
              f"{os.path.getsize(src) / 1e6:.1f} MB -> "
              f"{os.path.getsize(dst) / 1e6:.1f} MB")
    print(f"{len(entries)} entries, {total_raw / 1e6:.1f} MB raw -> "
          f"{total_gz / 1e6:.1f} MB committed in {SEED_DIR}")


if __name__ == "__main__":
    main()

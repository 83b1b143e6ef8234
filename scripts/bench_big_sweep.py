"""One-off sweep of the 256-feed (north-star feed count) round trip.

Usage: python scripts/bench_big_sweep.py NFREQ CHUNK [NRUN]
Prints one line: big-sweep nfreq=<f> chunk=<c> best=<s> per_freq=<s>
"""

import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402

bench._configure_jax()

nfreq = int(sys.argv[1])
chunk = int(sys.argv[2])
nrun = int(sys.argv[3]) if len(sys.argv) > 3 else 1

t, warm, npairs = bench.run_library(
    nfreq=nfreq,
    nfeed_side=16,
    autos=False,
    chunk=chunk,
    nrun=nrun,
    tag=f"sweep{nfreq}f_c{chunk}",
)
print(
    f"big-sweep nfreq={nfreq} chunk={chunk} npairs={npairs} "
    f"best={t:.3f} per_freq={t / nfreq:.4f} warm={warm:.1f}",
    flush=True,
)

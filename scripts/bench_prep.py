"""Pre-generate every bench scale's prep artifacts (synthetic genome +
read FASTAs, encoded-reference cache, k-mer index cache) so a later
`python bench.py` run — e.g. the driver's budgeted capture — pays only
load + warmup + timed passes and lands the LARGEST scale.

Runs on the CPU backend by default (index building never needs the chip;
forcing CPU also respects the one-TPU-process rule while a chip job is
live). The artifacts land in the same /tmp workdirs bench.py uses, keyed
by (genome_mbp, read_len, n_reads, n_warmup) — run with the same BENCH_*
env vars as the bench itself.

Usage:  python scripts/bench_prep.py [mbp ...]     (default: all scales)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import bench


def main():
    scales = [float(a) for a in sys.argv[1:]] or list(bench.SCALES_MBP)
    from ngmlr_tpu.config import Config
    from ngmlr_tpu.pipeline.runner import Pipeline
    for mbp in scales:
        t0 = time.time()
        if bench.cache_ready(mbp):
            print("%g Mbp: cache ready (%s)" % (mbp, bench.workdir_for(mbp)))
            continue
        tmpdir, ref_path, _, _ = bench.prepare_workdir(mbp)
        print("%g Mbp: FASTAs ready in %.1f s (%s)"
              % (mbp, time.time() - t0, tmpdir))
        t0 = time.time()
        Pipeline(Config(), ref_path, use_cache=True)
        print("%g Mbp: encoded ref + index cached in %.1f s"
              % (mbp, time.time() - t0))


if __name__ == "__main__":
    main()

"""Small-scale exercise of the human-scale machinery
(scripts/human_scale.py): the synthetic genome generator's N-runs and
repeat patches flow through encode + index build, and the index's
capacity-relevant invariants hold (uint32 positions, monotone buckets).

The real >= 1 Gbp numbers are recorded in docs/HUMAN_SCALE.md; this test
keeps the script importable and the pipeline it drives correct.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "human_scale", os.path.join(ROOT, "scripts", "human_scale.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generator_and_index_build(tmp_path):
    hs = _load_script()
    fa = str(tmp_path / "mini.fa")
    hs.make_genome_fa(fa, 0.002, seed=3)   # 2 Mbp, one chromosome

    from ngmlr_tpu.io.reference import ReferenceGenome
    from ngmlr_tpu.index.kmer_index import KmerIndex

    ref = ReferenceGenome.from_fasta(fa, use_cache=False, skip_save=True)
    assert len(ref.codes) > 2_000_000      # pads + spacers included

    idx = KmerIndex.build(ref, k=13, kmer_skip=2)
    assert idx.positions.dtype == np.uint32
    assert len(idx.positions) > 100_000
    # bucket starts are monotone and cover the position array
    bs = idx.bucket_start
    assert (np.diff(bs) >= 0).all()
    assert int(bs[-1]) == len(idx.positions)

    # the repeat patch must be subject to same-bin dedup / freq cutoff:
    # no single prefix bucket may exceed the reference's keep threshold
    counts = np.diff(bs)
    assert counts.max() <= 990   # max_prefix_freq=1000 weight!=0 bound

    # genome contains real N runs (generator contract; 80-col wrapping
    # splits them, so count N bases and look for a long wrapped run)
    with open(fa, "rb") as f:
        data = f.read()
    assert data.count(b"N") > 10_000
    assert b"N" * 80 in data

#!/usr/bin/env python3
"""Round-4 train-probe follow-up: the configs the first sweep left open.

`scripts/train_probe_r4.py` measured the baseline (b64 remat[2] →
79.4 clips/s under co-tenancy) and found accum2@b128 with remat[2]
compile-OOMs by exactly 601.67M (16.33G vs 15.75G HBM), with the
resident temps being the UN-rematted s4 residual adds
(bf16[64,8,14,14,1024] HLO temps inside the scan body). So the
follow-up matrix remats deeper for the accumulated configs, and runs
the bf16-optimizer-state legs the first sweep never reached:

  python scripts/train_probe_r4b.py | tee -a /tmp/train_probe_r4.jsonl
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.train_probe_r4 import measure  # noqa: E402


def main():
    from efficient_slowfast_tpu.utils.env import honor_jax_platforms

    honor_jax_platforms()
    # deeper remat closes the 602M gap: s3+s4 temps recomputed in backward
    measure("accum2 b128 remat[2,3,4]", 128, accum=2, stages=(2, 3, 4))
    measure("accum2 b128 remat-all", 128, accum=2, stages=())
    measure("bf16-opt b64 remat[2]", 64, opt_dtype="bfloat16")
    measure("accum2+bf16-opt b128 remat[2,3,4]", 128, accum=2,
            stages=(2, 3, 4), opt_dtype="bfloat16")
    # the r3 OOM point, retried with bf16 optimizer-state savings alone
    measure("b96 remat[2] bf16-opt", 96, opt_dtype="bfloat16")


if __name__ == "__main__":
    main()

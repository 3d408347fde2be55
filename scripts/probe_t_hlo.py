#!/usr/bin/env python
"""Dump the compiled HLO of the routed apply and count the big (>=64MB)
buffer-moving ops — names whether stage T (the 4D product transpose) lowers
to one pass or several on this XLA version.

Usage: python scripts/probe_t_hlo.py [corpus_name]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import ehyb_spmv_gpu_tpu as ehyb
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x
    from ehyb_spmv_gpu_tpu.io import generate

    name = sys.argv[1] if len(sys.argv) > 1 else "random_1m"
    m = generate.load_corpus(name)
    model = ehyb.MODELS["ehyb_routed"](ehyb.EhybConfig(artifact_cache=True)
                                       ).setup(m)
    x_dev = model.prepare_x(deterministic_x(m.dimension))

    fn = jax.jit(lambda xv: model.apply_operands(model.dev, xv))
    txt = fn.lower(x_dev).compile().as_text()
    out = "/tmp/routed_apply_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")
    # big tensors: f32[>=16M elements]
    pat = re.compile(r"f32\[(\d+(?:,\d+)*)\]")
    for line in txt.splitlines():
        ls = line.strip()
        m2 = pat.search(ls)
        if not m2:
            continue
        n = 1
        for d in m2.group(1).split(","):
            n *= int(d)
        if n >= (1 << 24) and ("fusion" in ls or "transpose" in ls
                               or "copy" in ls or "custom-call" in ls):
            print(ls[:220])


if __name__ == "__main__":
    main()

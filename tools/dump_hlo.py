#!/usr/bin/env python
"""Dump the bench step's optimized HLO and summarize the largest fusions.

Identifies which pipeline stage each expensive `fusion.N` from the xprof
trace corresponds to (gathers / cumsums / transposes and their shapes).
Usage: timeout 580 python tools/dump_hlo.py [--names fusion fusion.2 ...]
"""
import argparse
import math
import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--n", type=int, default=300_000)
    args = ap.parse_args()

    sys.argv = [sys.argv[0]]
    from tools.profile_bench import build_step

    step, fargs = build_step(packed=True, n=args.n)
    compiled = jax.jit(step).lower(*fargs).compile()
    txt = compiled.as_text()
    with open("/tmp/bench_step.hlo", "w") as f:
        f.write(txt)
    print(f"# HLO written to /tmp/bench_step.hlo ({len(txt)} bytes)")

    # collect computations per fusion name
    blocks = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?fused_computation[^ ]* .*{", line)
        if line.startswith("ENTRY"):
            cur = "ENTRY"
            blocks[cur] = []
        elif re.match(r"%?\S+ \(", line) and line.rstrip().endswith("{"):
            cur = line.split()[0].lstrip("%")
            blocks[cur] = []
        elif cur is not None:
            blocks[cur].append(line)

    # map fusion instr name -> computation, from ENTRY and nested calls
    fus = {}
    for line in txt.splitlines():
        m = re.search(
            r"(\S+) = \S+ fusion\(.*calls=%?([\w\.\-]+)", line
        )
        if m:
            fus[m.group(1).lstrip("%")] = (m.group(2), line.strip())

    names = args.names or sorted(fus)
    for name in names:
        if name not in fus:
            continue
        comp, defline = fus[name]
        body = blocks.get(comp, [])
        ops = {}
        big = []
        for line in body:
            m = re.search(r"= (\w+)\(", line)
            mshape = re.search(r"= (?:f32|s32|u32|pred|bf16)\[([\d,]*)\]", line)
            if m:
                ops[m.group(1)] = ops.get(m.group(1), 0) + 1
                if mshape:
                    dims = [int(d) for d in mshape.group(1).split(",") if d]
                    if math.prod(dims) >= (1 << 21):
                        big.append(line.strip()[:160])
        print(f"\n== {name} calls {comp}")
        print(f"   def: {defline[:200]}")
        print(f"   ops: {dict(sorted(ops.items(), key=lambda kv: -kv[1]))}")
        for b in big[:8]:
            print(f"   big: {b}")


if __name__ == "__main__":
    main()

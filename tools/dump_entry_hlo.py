"""Dump entry()'s TPU-lowered StableHLO text to a file — determinism probe.

Two fresh processes should produce byte-identical text; if they don't, the
persistent compile cache can never hit across processes (observed as two
jit_forward-*-cache entries from identical queue legs, r3r log).

Runs on the CPU backend (no device client) via cross-platform lowering.
Usage: python tools/dump_entry_hlo.py /tmp/entry_hlo_a.txt
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
import __graft_entry__ as g  # noqa: E402

fn, args = g.entry()
lowered = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
text = lowered.as_text()
with open(sys.argv[1], "w") as f:
    f.write(text)
print("wrote", sys.argv[1], len(text), "chars")

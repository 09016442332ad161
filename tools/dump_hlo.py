"""Dump the optimized HLO of the fused bench program for op attribution.

Writes the compiled module text to /tmp/fused_hlo.txt; pair with
profile_bench.py's per-op table (fusion.NNN names match) to find what each
hot generic fusion computes.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def _enable_compile_cache(jax):
    """Persistent compile cache: the remote-compile tunnel costs minutes per
    process otherwise (the in-memory cache is per-process)."""
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

def main() -> None:
    import jax

    _enable_compile_cache(jax)
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    sam_model = os.environ.get("BENCH_SAM", "facebook/sam-vit-base")
    opts = PipelineOptions(batch_size=batch, max_det=16, metric_crop=128)
    pipe = CellSegmentationPipeline(sam_model_type=sam_model, options=opts)
    st = pipe._stages(size, size)
    img = jnp.zeros((batch, size, size, 3), dtype=jnp.uint8)
    # fused_core is the jitted constant-free program (st["fused"] is a
    # thin binding wrapper since the s2d-as-argument change)
    compiled = st["fused_core"].lower(
        st["yolo_params"], st["sam_params"], st["yolo_s2d"], img
    ).compile()
    out = os.environ.get("HLO_OUT", "/tmp/fused_hlo.txt")
    with open(out, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote {out} ({os.path.getsize(out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()

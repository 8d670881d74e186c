"""AOT memory analysis of the single-jit flagship pipeline at bench shapes.

Usage: python tools/memcheck.py [H W]  (default 1080 1920)

Compiles ``MVSPipeline.jitted()`` without running it and prints the
compiler's memory analysis — the guard against the round-1 class of
regression where a layout change ballooned HLO temps past HBM
(VERDICT.md item 1).  Runs on whatever backend is active (TPU under axon,
CPU under JAX_PLATFORMS=cpu).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920

    import jax
    import jax.numpy as jnp

    from cl_multiview_stereo_tpu.config import SystemSettings
    from cl_multiview_stereo_tpu.models.mvs_pipeline import MVSPipeline

    s = SystemSettings()
    pipe = MVSPipeline.create(w, h, s)
    rgb = jax.ShapeDtypeStruct((s.view_num, h, w, 3), jnp.uint8)

    t0 = time.time()
    compiled = jax.jit(pipe.run).lower(rgb).compile()
    dt = time.time() - t0
    ma = compiled.memory_analysis()
    gb = 1024.0**3
    print(f"backend={jax.default_backend()} compile_s={dt:.1f}")
    print(f"temp_gb={ma.temp_size_in_bytes / gb:.3f}")
    print(f"arg_gb={ma.argument_size_in_bytes / gb:.3f}")
    print(f"out_gb={ma.output_size_in_bytes / gb:.3f}")
    print(f"code_mb={ma.generated_code_size_in_bytes / 1024.0**2:.1f}")


if __name__ == "__main__":
    main()

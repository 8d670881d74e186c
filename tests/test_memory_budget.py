"""AOT memory-budget regression guard (scaled-down BASELINE config-4 proxy).

The 49-view 2K 256-hypothesis configuration currently compiles to 126 GB of
per-device temps (BASELINE.md round 4) — dominated by per-pair refinement
structures.  This proxy pins today's footprint at a small 6-view scale so a
layout/temporary regression of the round-1 class (an innocent-looking
change ballooning HLO temps by an order of magnitude) fails fast in CI
instead of surfacing as an HBM OOM on the chip.

Measured baselines for this exact shape: 24.6 MB (round 4, per-hypothesis
dense) -> 283 MB (round 5, wide-row dense tables — a deliberate
memory-for-speed trade: 4.0x faster depth init, whole-pipeline AOT
7.57 GB at bench scale).  The bound leaves ~2x headroom for drift.
"""

import jax
import jax.numpy as jnp

from cl_multiview_stereo_tpu.config import SystemSettings
from cl_multiview_stereo_tpu.models.mvs_pipeline import MVSPipeline

_TEMP_BUDGET_MB = 600.0


def test_pipeline_aot_temps_within_budget():
    s = SystemSettings(array_width=3, array_height=2, min_disp=10,
                       max_disp=41, inc=1)
    h, w = 160, 192
    pipe = MVSPipeline.create(w, h, s)
    rgb = jax.ShapeDtypeStruct((s.view_num, h, w, 3), jnp.uint8)
    compiled = jax.jit(pipe.run).lower(rgb).compile()
    ma = compiled.memory_analysis()
    temp_mb = ma.temp_size_in_bytes / 2**20
    assert temp_mb < _TEMP_BUDGET_MB, (
        f"pipeline AOT temps {temp_mb:.1f} MB exceed the {_TEMP_BUDGET_MB} MB "
        "proxy budget — a temporary/layout regression of the config-4 class "
        "(see BASELINE.md round-4 memory attribution)"
    )


def test_view_pair_layout_shards_refinement_temps():
    """The config-4 fix itself, guarded: under a sharded view mesh the
    "view" pair layout must compile to a per-device footprint WELL below
    the packed layout's (whose per-pair temporaries replicate on every
    device — the 126 GB wall of BASELINE round 4, closed at 11.0 GB in
    round 5).  Scaled-down 2x3-view proxy of the same structure."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cl_multiview_stereo_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 6:
        import pytest

        pytest.skip("needs 6 devices")
    s = SystemSettings(array_width=3, array_height=2, min_disp=10,
                       max_disp=41, inc=1)
    h, w = 160, 192
    mesh = make_mesh(n_view=6, n_disp=1, devices=jax.devices()[:6])
    in_s = NamedSharding(mesh, P("view", None, None, None))
    rgb = jax.ShapeDtypeStruct((s.view_num, h, w, 3), jnp.uint8)

    temps = {}
    for layout in ("packed", "view"):
        pipe = MVSPipeline.create(w, h, s, pair_layout=layout)

        def fwd(x, pipe=pipe):
            return pipe.run(x).disp_full

        compiled = jax.jit(fwd, in_shardings=in_s).lower(rgb).compile()
        temps[layout] = compiled.memory_analysis().temp_size_in_bytes / 2**20

    # the view layout's per-device refinement structures shard with the
    # mesh; the packed layout replicates them — require a decisive gap
    assert temps["view"] < 0.7 * temps["packed"], temps

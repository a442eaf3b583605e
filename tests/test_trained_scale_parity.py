"""Trained-weight-scale kernel parity (VERDICT round-3 item 8).

Round 3 proved that init-scale golden tests miss what trained-scale
tests catch: production checkpoints carry pre-softmax logits of
O(1e4-1e5) (WE_logits reads the raw residual edge stream), which is
exactly the regime where the v3 per-tile softmax shift underflowed and
bf16 logit-bias storage injected O(100) absolute noise. This test loads
the shipped production LogD checkpoint (``runs/prod_logd_fast2``,
trained on the bf16/tile fast path) and asserts the tile-kernel forward
matches the lax forward at those real weight scales, model-level.
"""

from pathlib import Path

import numpy as np
import pytest

import jax

REPO = Path(__file__).resolve().parent.parent
CKPT = REPO / "runs" / "prod_logd_fast2" / "best.ckpt"

SMILES = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "CC(C)CC",
          "c1ccncc1", "CC(=O)O", "CCN(CC)CC", "C1CCCCC1",
          "CN1CCC[C@H]1c1cccnc1", "CC(=O)OC1=CC=CC=C1C(=O)O"]


@pytest.mark.skipif(not CKPT.exists(), reason="production ckpt absent")
class TestTrainedScaleParity:
    @pytest.fixture(scope="class")
    def loaded(self):
        from gt_pyg_tpu.checkpoint import load_model_checkpoint
        from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
        from gt_pyg_tpu.nn import GraphTransformerNet

        model, state, info = load_model_checkpoint(CKPT)
        cfg = info["model_config"]
        graphs = get_tensor_data(SMILES, [0.0] * len(SMILES),
                                 progress=False)
        # tile-packed batch (what the tile kernel requires); the lax path
        # consumes the same layout
        batch = pad_graph_batch(graphs, tile_edges=256, tiles_multiple=8,
                                graph_pad=len(SMILES), num_tasks=1)
        variables = {"params": state["params"],
                     "batch_stats": state.get("batch_stats", {})}
        return cfg, variables, batch

    def _forward(self, cfg, variables, batch, attn_impl, dtype):
        import jax.numpy as jnp

        from gt_pyg_tpu.nn import GraphTransformerNet

        model = GraphTransformerNet.from_config(
            cfg, attn_impl=attn_impl, dtype=dtype)
        pred, log_var = model.apply(variables, batch, deterministic=True)
        ng = len(SMILES)
        return np.asarray(pred)[:ng], np.asarray(log_var)[:ng]

    def test_tile_matches_lax_f32_trained_weights(self, loaded):
        """f32 tile (interpret mode on CPU) vs f32 lax on the trained
        checkpoint: model-level deviation < 1e-4 LogD units."""
        import jax.numpy as jnp

        cfg, variables, batch = loaded
        p_lax, _ = self._forward(cfg, variables, batch, "lax",
                                 jnp.float32)
        p_tile, _ = self._forward(cfg, variables, batch, "tile",
                                  jnp.float32)
        dev = np.max(np.abs(p_lax - p_tile))
        assert dev < 1e-4, f"tile-vs-lax deviation {dev} at trained scale"

    def test_bf16_tile_close_to_f32_lax(self, loaded):
        """The production bf16/tile fast path must stay within bf16
        rounding of the f32 forward at trained scales (the round-3 bug
        was a 0.54-unit deviation; the fix brought it to ~1e-3)."""
        import jax.numpy as jnp

        cfg, variables, batch = loaded
        p_f32, _ = self._forward(cfg, variables, batch, "lax",
                                 jnp.float32)
        p_bf16, _ = self._forward(cfg, variables, batch, "tile",
                                  jnp.bfloat16)
        dev = np.max(np.abs(p_f32 - p_bf16))
        assert dev < 0.05, f"bf16/tile fast path deviates {dev}"

    # NOTE the underflow REGIME itself (logit spreads of O(1e4+), which
    # grow from the raw residual edge stream rather than from weight
    # magnitudes) is pinned by the kernel-level regression at
    # tests/test_gt_tile_kernel.py (2e4-spread drive); this file pins the
    # model-level forward on the real production weights.

"""Full SEEM decoder parity vs the vendored torch decoder (demo task)."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import torch_shims
from tests.conftest import load_reference_package_module
from vitron_tpu.models.seem import decoder as dec
from vitron_tpu.models.seem import model as seem_model

torch = pytest.importorskip("torch")
torch_shims.install()

ATTN_ARCH = {
    "VARIABLE": {"queries": ["object"],
                 "tokens": ["grounding", "spatial", "visual", "audio"]},
    "SELF_ATTENTION": {
        "queries": {"object": ["queries_object", "tokens_grounding",
                                "tokens_spatial", "tokens_visual",
                                "tokens_audio"]},
        "tokens": {"grounding": ["queries_object", "tokens_grounding"],
                   "spatial": ["tokens_spatial"],
                   "visual": ["tokens_visual"],
                   "audio": ["queries_object", "tokens_audio"]},
    },
    "CROSS_ATTENTION": {
        "queries": {"object": True},
        "tokens": {"grounding": False, "spatial": False, "visual": False,
                   "audio": False},
    },
    "MASKING": ["tokens_spatial", "tokens_grounding", "tokens_visual",
                "tokens_audio"],
    "DUPLICATION": {"queries": {"grounding": "queries_object",
                                "spatial": "queries_object"}},
    "SPATIAL_MEMORIES": 8,
}

# task switches are built per request in the demo (interactive.py:65-110);
# enabling visual/spatial without their inputs crashes organize_output
TASK_SWITCH = {"mask": True, "bbox": False, "spatial": False,
               "grounding": True, "visual": False, "audio": False}


class LangStub(torch.nn.Module):
    """Mimics LanguageEncoder.compute_similarity (vlpencoder.py:293-299)."""

    def __init__(self, t_emb):
        super().__init__()
        self.t_emb = t_emb
        self.logit_scale = torch.nn.Parameter(torch.zeros(()))

    def compute_similarity(self, v_emb, name="default", fake=False):
        v = v_emb / (v_emb.norm(dim=-1, keepdim=True) + 1e-7)
        return self.logit_scale.exp() * v @ self.t_emb.unsqueeze(0).transpose(1, 2)


def test_full_decoder_parity_demo_grounding():
    ref_mod = load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.body.decoder.seem")
    torch.manual_seed(0)
    n_cls, d = 5, 32
    t_emb = torch.randn(n_cls, d)
    t_emb = t_emb / t_emb.norm(dim=-1, keepdim=True)
    ref = ref_mod.MultiScaleMaskedTransformerDecoder(
        lang_encoder=LangStub(t_emb), in_channels=32, mask_classification=True,
        hidden_dim=32, dim_proj=32, num_queries=7, contxt_len=16, nheads=4,
        dim_feedforward=64, dec_layers=3, pre_norm=False, mask_dim=32,
        task_switch=TASK_SWITCH, enforce_input_project=False,
        max_spatial_len=[16, 16, 16], attn_arch=dict(ATTN_ARCH))
    ref.eval()

    # our decoder with converted weights
    cfg = dec.SeemDecoderConfig(hidden_dim=32, dim_proj=32, num_queries=7,
                                num_heads=4, dim_feedforward=64, dec_layers=3,
                                mask_dim=32, num_feature_levels=3,
                                max_spatial_len=16)
    sd = {f"sem_seg_head.predictor.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, seem_model.convert_decoder_torch(sd, cfg))

    rs = np.random.RandomState(0)
    feats = [rs.randn(1, 32, 4, 4).astype(np.float32),
             rs.randn(1, 32, 8, 8).astype(np.float32),
             rs.randn(1, 32, 16, 16).astype(np.float32)]
    mask_features = rs.randn(1, 32, 16, 16).astype(np.float32)
    T = 6
    g_tokens = rs.randn(T, 32).astype(np.float32)

    with torch.no_grad():
        extra = {
            "grounding_tokens": torch.tensor(g_tokens)[:, None],  # [T, 1, C]
            "grounding_nonzero_mask": torch.zeros(1, T, dtype=torch.bool),
        }
        out_ref = ref([torch.tensor(f) for f in feats],
                      torch.tensor(mask_features), extra=extra, task="demo")

    got = dec.forward(
        params, cfg,
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
        jnp.asarray(mask_features.transpose(0, 2, 3, 1)),
        class_embeddings=jnp.asarray(t_emb.numpy()),
        logit_scale=jnp.zeros(()),
        grounding_tokens=jnp.asarray(g_tokens),
        grounding_valid=jnp.ones((T,), bool))

    np.testing.assert_allclose(np.asarray(got["pred_masks"]),
                               out_ref["pred_masks"].numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got["pred_captions"]),
                               out_ref["pred_captions"].numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got["pred_maskembs"]),
                               out_ref["pred_maskembs"].numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got["pred_logits"]),
                               out_ref["pred_logits"].numpy(),
                               rtol=5e-4, atol=5e-4)

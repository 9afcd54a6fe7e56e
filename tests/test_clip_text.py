"""CLIP text tower: numeric parity vs a real huggingface CLIPTextModel
oracle (tiny config) + empty-prompt embedder surface.

The reference UNet context is prompt_embeds + image_embeds
(pipeline_mvd_warp_mix_classifier.py:681); prompt_embeds is
``text_encoder(ids)[0]`` (:308-312). transformers is baked into the image,
so the oracle is constructed directly (same recipe as test_sam_convert).
"""

import numpy as np
import pytest

from g4splat_tpu.priors.clip_text import (
    BOS_ID,
    EOS_ID,
    CLIPText,
    CLIPTextEmbedder,
    convert_torch_clip_text,
    empty_prompt_ids,
)

pytestmark = pytest.mark.slow  # torch-oracle / integration tier


class TestEmptyPromptIds:
    def test_layout(self):
        ids = empty_prompt_ids(8, pad_id=0)
        assert ids.shape == (1, 8)
        assert ids[0, 0] == BOS_ID and ids[0, 1] == EOS_ID
        assert (ids[0, 2:] == 0).all()

    def test_sd1_padding(self):
        ids = empty_prompt_ids(6, pad_id=EOS_ID)
        assert (ids[0, 1:] == EOS_ID).all()


class TestTorchParity:
    def test_matches_hf_cliptextmodel(self):
        torch = pytest.importorskip("torch")
        from transformers import CLIPTextConfig, CLIPTextModel

        cfg = CLIPTextConfig(
            vocab_size=96, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, hidden_act="gelu",
        )
        torch.manual_seed(0)
        oracle = CLIPTextModel(cfg).eval()

        ids = np.array([[BOS_ID % 96, 5, 9, EOS_ID % 96, 0, 0, 0, 0]],
                       np.int64)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(ids)).last_hidden_state.numpy()

        model = CLIPText(vocab_size=96, width=32, depth=2, num_heads=4,
                         n_ctx=8, max_positions=16, act="gelu")
        params = convert_torch_clip_text(
            {k: v.numpy() for k, v in oracle.state_dict().items()}, depth=2)
        out = np.asarray(model.apply(params, ids.astype(np.int32)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_penultimate_depth_matches_truncated_oracle(self):
        torch = pytest.importorskip("torch")
        from transformers import CLIPTextConfig, CLIPTextModel

        cfg = CLIPTextConfig(
            vocab_size=96, hidden_size=32, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            max_position_embeddings=16, hidden_act="gelu",
        )
        torch.manual_seed(1)
        oracle = CLIPTextModel(cfg).eval()
        ids = np.array([[1, 2, 3, 4, 0, 0, 0, 0]], np.int64)
        with torch.no_grad():
            hs = oracle(torch.from_numpy(ids),
                        output_hidden_states=True).hidden_states
            # SD2.x recipe: penultimate hidden state + final LN on top.
            ref = oracle.text_model.final_layer_norm(hs[-2]).numpy()
        model = CLIPText(vocab_size=96, width=32, depth=2, num_heads=4,
                         n_ctx=8, max_positions=16, act="gelu")
        params = convert_torch_clip_text(
            {k: v.numpy() for k, v in oracle.state_dict().items()}, depth=2)
        out = np.asarray(model.apply(params, ids.astype(np.int32)))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


class TestEmbedder:
    def test_empty_prompt_cached_shape(self):
        model = CLIPText(vocab_size=64, width=16, depth=1, num_heads=2,
                         n_ctx=8)
        emb = CLIPTextEmbedder(model, pad_id=0)
        e1 = emb()
        e2 = emb()
        assert e1.shape == (1, 8, 16)
        assert e1 is e2  # cached

    def test_custom_ids(self):
        model = CLIPText(vocab_size=64, width=16, depth=1, num_heads=2,
                         n_ctx=8)
        emb = CLIPTextEmbedder(model, pad_id=0)
        out = emb(np.zeros((2, 8), np.int32))
        assert out.shape == (2, 8, 16)

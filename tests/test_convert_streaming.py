"""Streaming 4B checkpoint conversion (VERDICT r2 item 8).

The released cogview checkpoints are 7.8 GB fp16 ``.pt`` files
(utils.py:158-166, generate_samples.py:49-66); conversion must not build
an fp32 tree on top of torch's copy.  Contract under test: stored dtype
preserved end-to-end, per-tensor consumption (the source state_dict is
drained as it converts, so each torch storage frees the moment its copy
lands), and layout equivalence with the fp32 path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cogview_tpu.models.convert import gpt_from_state_dict, load_gpt_checkpoint

L, H, V, P = 48, 32, 96, 40  # synthetic 48-layer layout at tiny width


def _synthetic_sd(dtype=torch.float16, prefix=""):
    g = torch.Generator().manual_seed(0)
    sd = {}

    def t(*shape):
        return torch.randn(*shape, generator=g).to(dtype)

    sd[prefix + "word_embeddings.weight"] = t(V, H)
    sd[prefix + "transformer.position_embeddings.weight"] = t(P, H)
    for i in range(L):
        b = f"{prefix}transformer.layers.{i}."
        sd[b + "input_layernorm.weight"] = t(H)
        sd[b + "input_layernorm.bias"] = t(H)
        sd[b + "attention.query_key_value.weight"] = t(3 * H, H)
        sd[b + "attention.query_key_value.bias"] = t(3 * H)
        sd[b + "attention.dense.weight"] = t(H, H)
        sd[b + "attention.dense.bias"] = t(H)
        sd[b + "post_attention_layernorm.weight"] = t(H)
        sd[b + "post_attention_layernorm.bias"] = t(H)
        sd[b + "third_layernorm.weight"] = t(H)
        sd[b + "third_layernorm.bias"] = t(H)
        sd[b + "fourth_layernorm.weight"] = t(H)
        sd[b + "fourth_layernorm.bias"] = t(H)
        sd[b + "mlp.dense_h_to_4h.weight"] = t(4 * H, H)
        sd[b + "mlp.dense_h_to_4h.bias"] = t(4 * H)
        sd[b + "mlp.dense_4h_to_h.weight"] = t(H, 4 * H)
        sd[b + "mlp.dense_4h_to_h.bias"] = t(H)
    sd[prefix + "transformer.final_layernorm.weight"] = t(H)
    sd[prefix + "transformer.final_layernorm.bias"] = t(H)
    return sd


def test_streaming_conversion_preserves_fp16_and_drains_source():
    sd = _synthetic_sd(torch.float16, prefix="module.")
    n_src = len(sd)
    ref = gpt_from_state_dict(_synthetic_sd(torch.float16, prefix="module."),
                              L, 1, dtype=np.float32)
    params = gpt_from_state_dict(sd, L, 1, consume=True)

    # every torch tensor was consumed out of the dict as it converted
    assert len(sd) == 0, f"{len(sd)}/{n_src} tensors left in the source dict"

    # stored precision preserved: no fp32 tree
    leaves, _ = __import__("jax").tree.flatten(params)
    assert all(l.dtype == np.float16 for l in leaves), \
        sorted({str(l.dtype) for l in leaves})

    # layout identical to the fp32 path (values equal at fp16 precision)
    ref_leaves, ref_def = __import__("jax").tree.flatten(ref)
    leaves2, def2 = __import__("jax").tree.flatten(params)
    assert ref_def == def2
    for a, b in zip(ref_leaves, leaves2):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b.astype(np.float32), rtol=0, atol=0)

    # spot-check the qkv stacking semantics survived the rewrite
    assert params["layers"]["qkv"]["w"].shape == (L, H, 3, H)
    assert params["layers"]["mlp_in"]["w"].shape == (L, H, 4 * H)


def test_load_gpt_checkpoint_mmap_roundtrip(tmp_path):
    """DeepSpeed-style {module: sd} file through the mmap'd loader."""
    sd = _synthetic_sd(torch.float16, prefix="")
    path = str(tmp_path / "mp_rank_00_model_states.pt")
    torch.save({"module": sd}, path)
    params = load_gpt_checkpoint(path, L, 1)
    assert params["embed"]["word"].dtype == np.float16
    np.testing.assert_array_equal(
        params["embed"]["word"],
        sd["word_embeddings.weight"].float().numpy().astype(np.float16))
    # forcing fp32 still works for tooling that wants it
    p32 = load_gpt_checkpoint(path, L, 1, dtype=np.float32)
    assert p32["layers"]["qkv"]["w"].dtype == np.float32


def test_bf16_tensors_cross_via_bit_view():
    sd = _synthetic_sd(torch.bfloat16)
    params = gpt_from_state_dict(sd, L, 1, consume=True)
    import ml_dtypes

    w = params["layers"]["attn_out"]["w"]
    assert w.dtype == ml_dtypes.bfloat16
    # bit-exact: converting back to torch bf16 must reproduce the source
    back = torch.from_numpy(w[0].view(np.uint16).copy()).view(torch.bfloat16)
    src = _synthetic_sd(torch.bfloat16)["transformer.layers.0.attention.dense.weight"]
    assert torch.equal(back, src.T.contiguous())

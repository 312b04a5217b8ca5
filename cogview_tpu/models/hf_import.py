"""HuggingFace GPT-2 weight import (reference utils.py:422-437
``move_weights`` — used to warm-start text-side training).

Maps a transformers GPT2 state dict onto cogview_tpu GPT params.  The
architectures differ (GPT-2 has no Sandwich-LN), so only the shared
submodules transfer: token/position embeddings (into the text region of
the unified vocab), qkv/mlp weights and ln1/ln2; the sandwich layernorms
stay at identity init.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_hf_gpt2_into(params: Dict[str, Any], hf_model, txt_offset: int = 8192):
    """params: cogview_tpu GPT pytree (numpy); hf_model: transformers
    GPT2Model (or its state_dict).  Returns updated params."""
    sd = hf_model if isinstance(hf_model, dict) else {
        k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()
    }
    L = params["layers"]["qkv"]["w"].shape[0]
    H = params["layers"]["qkv"]["w"].shape[1]

    out = {k: v for k, v in params.items()}
    wte = np.asarray(sd["wte.weight"], np.float32)  # [V_hf, H]
    word = np.array(params["embed"]["word"])
    n = min(wte.shape[0], word.shape[0] - txt_offset)
    assert wte.shape[1] == H, "hidden size mismatch"
    word[txt_offset : txt_offset + n] = wte[:n]
    wpe = np.asarray(sd["wpe.weight"], np.float32)
    pos = np.array(params["embed"]["pos"])
    pn = min(wpe.shape[0], pos.shape[0])
    pos[:pn] = wpe[:pn]
    out["embed"] = {"word": word, "pos": pos}

    layers = {k: {kk: np.array(vv) for kk, vv in v.items()}
              for k, v in params["layers"].items()}
    for i in range(min(L, sum(1 for k in sd if k.endswith("attn.c_attn.weight")))):
        pre = f"h.{i}."
        # HF Conv1D stores [in, out] already
        layers["qkv"]["w"][i] = np.asarray(sd[pre + "attn.c_attn.weight"]).reshape(H, 3, H)
        layers["qkv"]["b"][i] = np.asarray(sd[pre + "attn.c_attn.bias"]).reshape(3, H)
        layers["attn_out"]["w"][i] = np.asarray(sd[pre + "attn.c_proj.weight"])
        layers["attn_out"]["b"][i] = np.asarray(sd[pre + "attn.c_proj.bias"])
        layers["mlp_in"]["w"][i] = np.asarray(sd[pre + "mlp.c_fc.weight"])
        layers["mlp_in"]["b"][i] = np.asarray(sd[pre + "mlp.c_fc.bias"])
        layers["mlp_out"]["w"][i] = np.asarray(sd[pre + "mlp.c_proj.weight"])
        layers["mlp_out"]["b"][i] = np.asarray(sd[pre + "mlp.c_proj.bias"])
        layers["ln_in"]["g"][i] = np.asarray(sd[pre + "ln_1.weight"])
        layers["ln_in"]["b"][i] = np.asarray(sd[pre + "ln_1.bias"])
        layers["ln_post"]["g"][i] = np.asarray(sd[pre + "ln_2.weight"])
        layers["ln_post"]["b"][i] = np.asarray(sd[pre + "ln_2.bias"])
    out["layers"] = layers
    out["ln_final"] = {
        "g": np.asarray(sd["ln_f.weight"]),
        "b": np.asarray(sd["ln_f.bias"]),
    }
    return out

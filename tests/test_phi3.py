"""Phi-3 model family: converter fused-tensor splits vs HF golden.

Beyond-parity family (reference loads Llama/Mistral only, xalm.h:141).
Phi-3's only delta from the Mistral family is storage: HF fuses
qkv_proj (rows [q|k|v]) and gate_up_proj (rows [gate|up]); the converter
splits them into the canonical separate tensors and everything else —
rope permute, GQA, GLU — rides the standard pipeline. LongRope variants
are rejected explicitly (4k-context base models convert)."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

PHI3_OVERRIDES = {
    "architectures": ["Phi3ForCausalLM"],
    "model_type": "phi3",
    "hidden_act": "silu",
    "tie_word_embeddings": False,
    "pad_token_id": 0,  # Phi3Config defaults to 32000, beyond the tiny vocab
}

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262, 263, 264, 8, 9, 1, 2, 33]


@pytest.fixture(scope="module")
def tiny_phi(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf") / "tiny_phi3")
    return make_tiny_model(d, config_overrides=PHI3_OVERRIDES)


@pytest.fixture(scope="module")
def phi_xalm(tiny_phi, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("x") / "tiny_phi3.xalm")
    assert cvt.main(["--input", tiny_phi, "--output", out, "--type", "f32"]) == 0
    return out


def test_phi3_logits_match_hf(phi_xalm, tiny_phi):
    import jax.numpy as jnp
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_phi, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        want = model(torch.tensor([TOKENS])).logits[0].numpy()

    eng = Engine.from_xalm(phi_xalm, kv_dtype=jnp.float32, progress=False)
    got, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_phi3_generate_greedy_matches_hf(phi_xalm, tiny_phi):
    import torch
    import transformers

    eng = Engine.from_xalm(phi_xalm, progress=False)
    out, _ = eng.generate(TOKENS[:6], 12, stop_on_eos=False, segment=1)
    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_phi, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        hf = model.generate(
            torch.tensor([TOKENS[:6]]), max_new_tokens=12, do_sample=False
        )[0][6:].tolist()
    assert out == hf


def test_phi3_longrope_rejected(tiny_phi, tmp_path):
    import json
    import shutil

    d = str(tmp_path / "phi3_lr")
    shutil.copytree(tiny_phi, d)
    cfgp = f"{d}/config.json"
    cfg = json.load(open(cfgp))
    cfg["rope_scaling"] = {
        "type": "longrope", "short_factor": [1.0], "long_factor": [1.0]
    }
    json.dump(cfg, open(cfgp, "w"))
    with pytest.raises(ValueError, match="longrope"):
        cvt.main(["--input", d, "--output", str(tmp_path / "x.xalm"), "--type", "f16"])

"""Wire-format round trip against a REAL HF-format checkpoint.

Builds a genuine transformers Llama (random weights, saved with
``save_pretrained`` — the exact safetensors + config.json layout real
checkpoints ship), converts it with ``tools/convert.py`` (the pipeline
matching reference utils.py:759-981), loads through the framework, and
compares logits against torch's own forward — closing the loop the tiny
random fixture can't (VERDICT r2 #9)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from mlx_parallm_tpu.core import loader  # noqa: E402
from mlx_parallm_tpu.tools.convert import convert  # noqa: E402
from mlx_parallm_tpu.tools.tiny_model import build_tokenizer  # noqa: E402

IDS = [[1, 5, 9, 200, 33, 7, 42, 250]]


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=512,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).eval()
    hf_dir = tmp_path_factory.mktemp("hf_ckpt")
    m.save_pretrained(hf_dir)
    build_tokenizer(hf_dir, vocab_size=512)
    with torch.no_grad():
        ref = m(torch.tensor(IDS)).logits.float().numpy()
    return str(hf_dir), ref


def _our_logits(model_dir: str) -> np.ndarray:
    model, tok = loader.load(model_dir, dtype=jnp.float32)
    logits, _ = model.apply_fn()(model.params, jnp.asarray(IDS), None)
    return np.asarray(logits, dtype=np.float32)


def test_float_conversion_matches_torch(hf_checkpoint, tmp_path):
    hf_dir, ref = hf_checkpoint
    out = tmp_path / "conv_f32"
    convert(hf_path=hf_dir, tpu_path=str(out), dtype="float32")
    ours = _our_logits(str(out))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_int4_conversion_close_to_torch(hf_checkpoint, tmp_path):
    hf_dir, ref = hf_checkpoint
    out = tmp_path / "conv_q4"
    convert(
        hf_path=hf_dir, tpu_path=str(out), quantize=True,
        q_group_size=32, q_bits=4, dtype="float32",
    )
    import json
    import os

    cfg = json.load(open(os.path.join(out, "config.json")))
    assert cfg["quantization"] == {"group_size": 32, "bits": 4}
    ours = _our_logits(str(out))
    # int4 shifts logits; the predicted (argmax) token stream must still
    # agree at most positions.
    agree = (ours.argmax(-1) == ref.argmax(-1)).mean()
    assert agree >= 0.75, f"argmax agreement {agree}"
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98, f"logit correlation {corr}"


def test_upload_to_hub_mocked(tmp_path):
    """upload_to_hub writes a model card and drives the hub client
    (reference utils.py:783-831); a failing client degrades gracefully."""
    from mlx_parallm_tpu.tools import convert as C

    class MockApi:
        def __init__(self):
            self.calls = []

        def create_repo(self, repo_id, exist_ok=False):
            self.calls.append(("create_repo", repo_id, exist_ok))

        def upload_folder(self, folder_path, repo_id, repo_type):
            self.calls.append(("upload_folder", folder_path, repo_id, repo_type))

    api = MockApi()
    ok = C.upload_to_hub(str(tmp_path), "me/tpu-model", "org/src-model", api=api)
    assert ok
    assert api.calls[0] == ("create_repo", "me/tpu-model", True)
    assert api.calls[1][2] == "me/tpu-model"
    card = (tmp_path / "README.md").read_text()
    assert "me/tpu-model" in card and "org/src-model" in card

    class FailApi:
        def create_repo(self, **kw):
            raise OSError("no network")

    assert not C.upload_to_hub(
        str(tmp_path), "me/tpu-model", "org/src-model", api=FailApi()
    )

"""Text encoders for the T2I engines.

The reference calls pipe.encode_prompt (src/modules/edit.py:1187-1194) =
CLIP tokenizer + text encoder final hidden states (SD/LCM), or T5-XXL for
DeepFloyd-IF. Here: transformers Flax models, loaded from local paths
(no hub egress in this environment); a hash-embedding fake encoder serves
tests and smoke runs.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# prompt -> (1, seq, dim) hidden states
PromptEncoder = Callable[[str], jnp.ndarray]


def _from_pretrained_any(cls, model_path: str):
    """Load flax weights if present, else convert the torch checkpoint in the
    directory (the common case for user-downloaded diffusers/transformers
    dirs, which ship pytorch_model.bin / model.safetensors)."""
    try:
        return cls.from_pretrained(model_path)
    except (OSError, EnvironmentError):
        return cls.from_pretrained(model_path, from_pt=True)


def clip_prompt_encoder(model_path: str, max_length: int = 77) -> PromptEncoder:
    """FlaxCLIPTextModel + tokenizer from a local directory."""
    from transformers import CLIPTokenizer, FlaxCLIPTextModel

    tok = CLIPTokenizer.from_pretrained(model_path)
    enc = _from_pretrained_any(FlaxCLIPTextModel, model_path)

    def encode(prompt: str) -> jnp.ndarray:
        ids = tok(prompt, padding="max_length", max_length=max_length,
                  truncation=True, return_tensors="np")
        out = enc(input_ids=ids["input_ids"])
        return jnp.asarray(out.last_hidden_state)

    return encode


def t5_prompt_encoder(model_path: str, max_length: int = 77) -> PromptEncoder:
    """FlaxT5EncoderModel (DeepFloyd-IF conditioning) from a local directory."""
    from transformers import AutoTokenizer, FlaxT5EncoderModel

    tok = AutoTokenizer.from_pretrained(model_path)
    enc = _from_pretrained_any(FlaxT5EncoderModel, model_path)

    def encode(prompt: str) -> jnp.ndarray:
        ids = tok(prompt, padding="max_length", max_length=max_length,
                  truncation=True, return_tensors="np")
        out = enc(input_ids=ids["input_ids"],
                  attention_mask=ids["attention_mask"])
        return jnp.asarray(out.last_hidden_state)

    return encode


def fake_prompt_encoder(dim: int, seq: int = 77) -> PromptEncoder:
    """Deterministic prompt-dependent embeddings for tests/smoke: distinct
    prompts map to distinct fixed Gaussian tables."""
    import hashlib

    def encode(prompt: str) -> jnp.ndarray:
        seed = int.from_bytes(
            hashlib.blake2b(prompt.encode(), digest_size=4).digest(), "big")
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.normal(size=(1, seq, dim)).astype(np.float32) * 0.2)

    return encode

"""Tokenizer wrapper + incremental streaming detokenizer.

Replaces mlx_lm's TokenizerWrapper / streaming detokenizer (reference:
/root/reference/mlx_parallm/utils.py:24, used throughout the generation loops)
with HF ``transformers`` tokenizers and a UTF-8-boundary-safe incremental
detokenizer (SURVEY §7.4 item 6): multi-byte characters that are split across
token boundaries are withheld until complete, so streamed SSE deltas are always
valid UTF-8.
"""

from __future__ import annotations

import json
import os
from typing import Any, List, Optional, Sequence


class IncrementalDetokenizer:
    """Streams text deltas from incrementally appended token ids."""

    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self._tokenizer = tokenizer
        self._skip_special = skip_special_tokens
        self.tokens: List[int] = []
        self._window_start = 0  # first token of the undecoded window
        self._committed = ""  # text emitted from tokens before window_start
        self._window_emitted = 0  # chars of the window's decode already emitted
        self.last_segment = ""

    def reset(self):
        self.tokens = []
        self._window_start = 0
        self._committed = ""
        self._window_emitted = 0
        self.last_segment = ""

    @property
    def text(self) -> str:
        window = self._decode_window()
        if window.endswith("�"):
            window = window[: self._window_emitted]
        return self._committed + window

    @property
    def peek_text(self) -> str:
        """Like :attr:`text` but INCLUDES the withheld incomplete-UTF-8
        tail (as U+FFFD). Non-destructive — for matching stop sequences
        that may complete inside the buffered tail without waiting for
        the next token or a destructive :meth:`finalize`."""
        return self._committed + self._decode_window()

    def _decode_window(self) -> str:
        return self._tokenizer.decode(
            self.tokens[self._window_start :],
            skip_special_tokens=self._skip_special,
        )

    def add_token(self, token: int) -> None:
        self.tokens.append(int(token))
        window = self._decode_window()
        if window.endswith("�"):
            # Incomplete UTF-8 sequence at the tail — withhold it.
            self.last_segment = ""
            return
        self.last_segment = window[self._window_emitted :]
        self._window_emitted = len(window)
        # Commit and shrink the window when it gets long and is cleanly
        # decodable (keeps per-token decode cost O(window), not O(n)).
        if len(self.tokens) - self._window_start > 48:
            self._committed += window
            self._window_start = len(self.tokens)
            self._window_emitted = 0

    def finalize(self) -> None:
        window = self._decode_window()
        self.last_segment = window[self._window_emitted :]
        self._committed += window
        self._window_start = len(self.tokens)
        self._window_emitted = 0


class TokenizerWrapper:
    """Thin convenience wrapper over a HF tokenizer."""

    def __init__(self, tokenizer):
        self._tokenizer = tokenizer
        eos = tokenizer.eos_token_id
        self.eos_token_ids = set()
        if eos is not None:
            if isinstance(eos, (list, tuple)):
                self.eos_token_ids.update(int(e) for e in eos)
            else:
                self.eos_token_ids.add(int(eos))
        cfg_eos = getattr(tokenizer, "_extra_eos_ids", None)
        if cfg_eos:
            self.eos_token_ids.update(cfg_eos)

    def __getattr__(self, name):
        return getattr(self._tokenizer, name)

    @property
    def pad_token_id(self) -> int:
        pid = self._tokenizer.pad_token_id
        if pid is None:
            pid = self._tokenizer.eos_token_id
        if isinstance(pid, (list, tuple)):
            pid = pid[0]
        return int(pid) if pid is not None else 0

    def encode(self, text: str, **kw) -> List[int]:
        return self._tokenizer.encode(text, **kw)

    def decode(self, ids: Sequence[int], **kw) -> str:
        return self._tokenizer.decode(ids, **kw)

    def apply_chat_template(self, messages, **kw):
        return self._tokenizer.apply_chat_template(messages, **kw)

    @property
    def has_chat_template(self) -> bool:
        return getattr(self._tokenizer, "chat_template", None) is not None

    def make_detokenizer(self, skip_special_tokens: bool = True) -> IncrementalDetokenizer:
        return IncrementalDetokenizer(self._tokenizer, skip_special_tokens)


def load_tokenizer(model_path: str, eos_token: Optional[str] = None) -> TokenizerWrapper:
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_path, local_files_only=True)
    # Some checkpoints declare extra EOS ids in generation_config.json.
    extra: set = set()
    gen_cfg = os.path.join(model_path, "generation_config.json")
    if os.path.exists(gen_cfg):
        try:
            with open(gen_cfg) as f:
                cfg = json.load(f)
            eos = cfg.get("eos_token_id")
            if isinstance(eos, list):
                extra.update(int(e) for e in eos)
            elif eos is not None:
                extra.add(int(eos))
        except Exception:
            pass
    tok._extra_eos_ids = extra
    return TokenizerWrapper(tok)

"""Manual n=2 verification for completions + chat against a running server
(parity: reference scripts/test_n_choices.py:52-147).

Usage: python scripts/test_n_choices.py --base-url http://127.0.0.1:8000 \
         --model <model-id>
"""

from __future__ import annotations

import argparse
import sys

import requests


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:8000")
    ap.add_argument("--model", required=True)
    ap.add_argument("--max-tokens", type=int, default=24)
    ns = ap.parse_args()
    ok = True

    r = requests.post(
        f"{ns.base_url}/v1/completions",
        json={
            "model": ns.model,
            "prompt": "Pick a random animal and describe it:",
            "max_tokens": ns.max_tokens,
            "n": 2,
            "temperature": 0.9,
        },
        timeout=300,
    )
    r.raise_for_status()
    choices = r.json()["choices"]
    print(f"completions n=2 -> {len(choices)} choices")
    for c in choices:
        print(f"  [{c['index']}] {c['text']!r}")
    if len(choices) != 2 or [c["index"] for c in choices] != [0, 1]:
        print("FAIL: wrong choice structure")
        ok = False

    r = requests.post(
        f"{ns.base_url}/v1/chat/completions",
        json={
            "model": ns.model,
            "messages": [{"role": "user", "content": "Say a random word."}],
            "max_tokens": ns.max_tokens,
            "n": 2,
            "temperature": 0.9,
        },
        timeout=300,
    )
    r.raise_for_status()
    choices = r.json()["choices"]
    print(f"chat n=2 -> {len(choices)} choices")
    for c in choices:
        print(f"  [{c['index']}] {c['message']['content']!r}")
    if len(choices) != 2:
        print("FAIL: wrong chat choice structure")
        ok = False

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

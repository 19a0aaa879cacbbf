"""Standalone HTTP serving-bench reproduction with full metric deltas.

Run: timeout 2400 python scripts/probe_serving.py [num_slots] [kv_bits]
"""

import sys

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    from mlx_parallm_tpu.server import main as SM

    ns = int(sys.argv[1]) if len(sys.argv) > 1 else None
    kv = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if ns is not None or kv is not None:
        orig_init = SM.ServerArgs.__init__

        def patched(self, *a, **k):
            orig_init(self, *a, **k)
            if ns is not None:
                self.num_slots = ns
            if kv is not None:
                self.kv_bits = kv

        SM.ServerArgs.__init__ = patched

    model = bench.build_random_quantized_llama(layers=32)

    out = bench.run_serving_bench(model, port=18355)
    print("RESULT", out)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Prebuild the frozen+LoRA weight treecaches bench.py/serve.py load.

Runs entirely on the CPU backend (never touches the TPU), so it can run
while a bench compile is in flight. Keys must stay in lockstep with
``bench._init_weights`` — each family's cache is keyed by the *CLI*
``--lora-rank`` (default 64), even where the bundle clamps it (SD3 → 32).

  python scripts/prebuild_treecache.py [sdxl sd15 sd3]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend use

import bench  # noqa: E402  (repo-root module; sets up the compile cache too)
from pcm_tpu.configs.families import sd3_bundle, sd15_bundle, sdxl_bundle  # noqa: E402

BUILDERS = {
    "sdxl": lambda: sdxl_bundle(lora_rank=64, remat=False),
    "sd15": lambda: sd15_bundle(lora_rank=64, remat=False),
    "sd3": lambda: sd3_bundle(lora_rank=32, remat=False),
}


def main():
    families = sys.argv[1:] or ["sdxl", "sd15", "sd3"]
    for family in families:
        print(f"# prebuilding {family} treecache (int8)...", file=sys.stderr)
        # lora_rank=64 mirrors bench.py's CLI default so the key matches
        bench._init_weights(BUILDERS[family](), family, 64, "int8")


if __name__ == "__main__":
    main()

"""Convert a full train-state checkpoint to a serving (params-only) file.

Reference analog: /root/reference/utils/deepspeed_state_dicts_gen.py:1-5,
which converts DeepSpeed ZeRO checkpoint directories to plain fp32 state
dicts.  Here train-state checkpoints (step + params + sharded optimizer
moments, written by clipcap_tpu.train) are flattened to a params-only
``.npz`` that ``clipcap_tpu.load`` consumes directly.

Usage:
    python -m clipcap_tpu.utils.export_checkpoint \
        --checkpoint models/clipcap_final.npz --output model.npz \
        [--config models/clipcap_config.yaml]
"""
from __future__ import annotations

import argparse

import numpy as np


def export_params(checkpoint_path: str, output_path: str, config_path: str = None) -> int:
    from clipcap_tpu.train.checkpoint import SEP

    if checkpoint_path.endswith(".npz"):
        flat = dict(np.load(checkpoint_path))
        prefix = f"params{SEP}"
        params_only = {k[len(prefix):]: v for k, v in flat.items() if k.startswith(prefix)}
        if not params_only:  # already params-only
            params_only = flat
        np.savez(output_path, **params_only)
    else:
        # orbax directory checkpoint: needs the model structure from config
        assert config_path, "--config is required for orbax checkpoints"
        from clipcap_tpu.config import load_yaml_config
        from clipcap_tpu.models.clipcap import init_clipcap
        from clipcap_tpu.train.checkpoint import save_params, _orbax_restore

        config = load_yaml_config(config_path)
        model = init_clipcap(config)
        restored = _orbax_restore(checkpoint_path, {"step": 0, "params": model.params,
                                                    "opt_state": None})
        save_params(output_path, restored["params"])
    print(f"wrote params-only checkpoint: {output_path}")
    return 0


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="full train-state checkpoint (.npz or orbax dir)")
    parser.add_argument("--output", required=True, help="output .npz path")
    parser.add_argument("--config", default=None,
                        help="model config yaml (needed for orbax checkpoints)")
    args = parser.parse_args()
    return export_params(args.checkpoint, args.output, args.config)


if __name__ == "__main__":
    exit(main())

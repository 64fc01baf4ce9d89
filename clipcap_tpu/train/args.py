"""Training CLI args — flag parity with /root/reference/clipcap/train/args.py:3-114.

TPU-native substitutions (documented):
* ``--device`` selects TPU/CPU chips instead of CUDA ids (same syntax:
  '-1' = all, '0' = chip 0, '0,1' = chips 0 and 1).
* ``--enable-deepspeed``/``--deepspeed-strategy`` become
  ``--zero1-optimizer-sharding`` (ZeRO-1 analog: optimizer moments sharded
  over the data mesh axis); the deepspeed flags are still accepted and map
  onto it so reference command lines keep working.
* ``--fp-precision 16`` means bfloat16 compute (TPU's native half).
"""
from argparse import ArgumentParser

from clipcap_tpu.utils.argtypes import str2bool


def add_training_args(parser: ArgumentParser) -> ArgumentParser:
    training = parser.add_argument_group("training")
    training.add_argument("--batch-size", type=int, default=64,
                          help="Number of samples contained in each batch (global, across all chips).")
    training.add_argument("--epochs", type=int, default=5,
                          help="Number of training cycles of the training data before exiting.")
    training.add_argument("--optimizer-lr", type=float, default=2e-5,
                          help="Optimizer learning rate.")
    training.add_argument("--scheduler-warmup-steps", type=int, default=5000,
                          help="LR scheduler warmup duration in steps.")
    training.add_argument("--fp-precision", type=int, default=32,
                          help="Compute precision: 16 = bfloat16 (TPU native), 32/64 = float32/64.")
    training.add_argument("--checkpoint-save-frequency", type=int, default=1,
                          help="Save a new checkpoint every 'n' epochs.")
    training.add_argument("--checkpoint-filename-prefix", type=str, default="clipcap",
                          help="Checkpoint filename prefix. (Reference default was the int 1 — fixed.)")
    training.add_argument("--device", type=str, default="-1",
                          help="Chips to use: '-1' for all, '<n>' or '<n>,<n>,...' for specific ones.")
    training.add_argument("--grad-clip-norm", type=float, default=0.0,
                          help="Global-norm gradient clipping (0 disables).")
    training.add_argument("--fused-optimizer", type=str2bool, default=False,
                          help="Use the Pallas fused-AdamW kernel (single HBM pass per "
                               "param block; the DeepSpeed-FusedAdam analog, model.py:72-74).")
    training.add_argument("--resume-from", type=str, default=None,
                          help="Path to a full train-state checkpoint to resume from (step/params/moments).")
    training.add_argument("--profile-dir", type=str, default=None,
                          help="Capture a jax.profiler trace of early post-compile steps "
                               "into this directory (view with TensorBoard/xprof).")
    training.add_argument("--remat", type=str2bool, default=None,
                          help="Activation rematerialization. Default: auto (on for "
                               "finetuning or per-chip batches >= 128).")

    data = parser.add_argument_group("data")
    data.add_argument("--input-dataset", type=str, default="./dataset/",
                      help="Path to the preprocessed dataset.")
    data.add_argument("--output-folder", type=str, default="./models/",
                      help="Directory to save trained checkpoints to.")
    data.add_argument("--reader-max-piece-size", type=int, default=50,
                      help="Maximum piece size for the embedding reader.")
    data.add_argument("--reader-parallel-pieces", type=int, default=10,
                      help="Number of pieces to read in parallel.")

    dist = parser.add_argument_group("distributed")
    dist.add_argument("--zero1-optimizer-sharding", type=str2bool, default=True,
                      help="Shard optimizer moments over the data mesh axis (ZeRO-1 analog).")
    dist.add_argument("--mesh-model", type=int, default=0,
                      help="Tensor-parallel the LM over M devices (Megatron "
                           "column/row shardings on the mesh's model axis, "
                           "parallel/tp.py; M must divide the LM's head "
                           "count). Composes with data parallelism over the "
                           "remaining devices and with ZeRO-1 moment "
                           "sharding. 0/1 = no tensor parallelism.")
    dist.add_argument("--enable-deepspeed", type=str2bool, default=False,
                      help="[reference-compat] maps onto --zero1-optimizer-sharding.")
    dist.add_argument("--deepspeed-strategy", type=str, default=None,
                      help="[reference-compat] ZeRO stage string (e.g. 'deepspeed_stage_1'). "
                           "Only stage 1 (optimizer-moment sharding) is implemented: at this "
                           "model scale params+grads fit per-chip, so stages 2/3 would add "
                           "collectives without saving anything (see SCALING.md). Requesting "
                           "stage 2/3 is an error, not a silent downgrade.")

    wandb = parser.add_argument_group("wandb")
    wandb.add_argument("--enable-wandb", type=str2bool, default=False,
                       help="Enable logging stats to wandb.")
    wandb.add_argument("--wandb-project", type=str, default="clipcap",
                       help="The name of the Wandb project.")
    wandb.add_argument("--logging-frequency", type=int, default=50,
                       help="New data is logged every 'n' steps.")
    return parser

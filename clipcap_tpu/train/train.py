"""Training orchestrator — the TPU-native ``python -m clipcap_tpu.train``.

Reference call stack mirrored (/root/reference/clipcap/train/train.py:17-104):
read ``encoder_config.yaml`` → build dataloader + discover embedding size →
assemble Config/TrainingConfig (total_steps = len(dl)·epochs) → pick
prefix-only vs full-finetune → train → checkpoints.

The PL ``Trainer`` + DDP/DeepSpeed stack is replaced by: a named device
mesh, one jitted train step with sharded batch + ZeRO-1 moments
(clipcap_tpu.train.step), a host-side prefetching dataloader, and orbax/npz
checkpointing with full resume (which the reference lacks — SURVEY.md §5.4).
"""
from __future__ import annotations

import time
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser, Namespace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from clipcap_tpu.config import Config, EncoderConfig, TrainingConfig
from clipcap_tpu.models.args import add_model_args
from clipcap_tpu.models.clipcap import init_clipcap
from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh
from clipcap_tpu.train.args import add_training_args
from clipcap_tpu.train.checkpoint import CheckpointSaver, restore_train_state
from clipcap_tpu.train.dataloader import get_dataloader
from clipcap_tpu.train.state import create_train_state, make_optimizer
from clipcap_tpu.train.step import make_train_step


def resolve_zero_sharding(deepspeed_strategy, zero1_flag, enable_deepspeed):
    """Map reference DeepSpeed flags onto the ZeRO-1 analog.

    Only stage 1 (optimizer-moment sharding over the data axis) exists:
    at this model scale params+grads fit per-chip, so stages 2/3 would add
    collectives without saving memory (SCALING.md). Requesting them is an
    error, not a silent downgrade
    (reference: /root/reference/clipcap/train/args.py:87-92 accepts any
    stage string and passes it to PL).
    """
    zero1 = bool(zero1_flag or enable_deepspeed)
    if deepspeed_strategy:
        strategy = str(deepspeed_strategy).lower()
        if any(f"stage_{s}" in strategy or strategy == str(s) for s in (2, 3)):
            raise SystemExit(
                f"--deepspeed-strategy {deepspeed_strategy!r}: only ZeRO "
                "stage 1 (optimizer-moment sharding) is implemented — at "
                "this model scale params and grads fit per-chip, so stages "
                "2/3 add collectives without saving memory. See SCALING.md. "
                "Use 'deepspeed_stage_1' or drop the flag."
            )
        zero1 = True
    return zero1


def _select_devices(device_arg: str):
    devs = jax.devices()
    if device_arg in ("-1", "", None):
        return devs
    ids = [int(d) for d in str(device_arg).split(",")]
    return [devs[i] for i in ids]


def train(args: Namespace) -> int:
    compute_dtype = jnp.bfloat16 if args.fp_precision == 16 else (
        jnp.float64 if args.fp_precision == 64 else jnp.float32
    )
    zero1 = resolve_zero_sharding(  # validate flags before any heavy work
        args.deepspeed_strategy, args.zero1_optimizer_sharding,
        args.enable_deepspeed,
    )

    with open(Path(args.input_dataset) / "encoder_config.yaml", "r") as f:
        encoder_config = EncoderConfig(**yaml.safe_load(f))

    # Multi-host pod: --batch-size stays the GLOBAL batch; each process
    # streams a disjoint contiguous row range and contributes its
    # batch_size/process_count share of every step via
    # jax.make_array_from_process_local_data below.
    pc, pi = jax.process_count(), jax.process_index()
    is_main = pi == 0
    if pc > 1 and args.batch_size % pc:
        print(f"train: --batch-size {args.batch_size} must be divisible by "
              f"the process count ({pc})")
        return 1
    local_batch = args.batch_size // pc

    dataloader, encoder_embedding_size = get_dataloader(
        data_path=args.input_dataset,
        language_model=args.language_model,
        batch_size=local_batch,
        reader_max_piece_size=args.reader_max_piece_size,
        reader_parallel_pieces=args.reader_parallel_pieces,
        process_index=pi if pc > 1 else None,
        process_count=pc if pc > 1 else None,
    )

    encoder_config.encoder_embedding_size = encoder_embedding_size
    args.total_steps = len(dataloader) * args.epochs

    model_config = Config.from_args(args)
    model_config.training_config = TrainingConfig.from_args(args)
    model_config.encoder_config = encoder_config

    model = init_clipcap(model_config)
    mode = "prefix + language model" if args.train_language_model else "prefix only"
    if is_main:
        print(f"training {mode}; total_steps={args.total_steps}" +
              (f" over {pc} processes" if pc > 1 else ""))

    devices = _select_devices(args.device)
    mesh_model = max(1, int(getattr(args, "mesh_model", 0) or 0))
    mesh = make_mesh(MeshConfig(model=mesh_model), devices=devices)
    if is_main:
        print(f"mesh: {dict(mesh.shape)} over {len(devices)} device(s)")

    tx = make_optimizer(
        lr=args.optimizer_lr,
        warmup_steps=args.scheduler_warmup_steps,
        total_steps=args.total_steps,
        train_language_model=args.train_language_model,
        grad_clip_norm=args.grad_clip_norm or None,
        fused=args.fused_optimizer,
    )
    state = create_train_state(model.params, tx)
    if args.resume_from:
        state = restore_train_state(args.resume_from, state)
        print(f"resumed from {args.resume_from} at step {int(state.step)}")

    # --mesh-model: tensor-parallel LM over the mesh's model axis.
    # Checkpoints stay in the canonical qkv layout — the state is packed
    # head-major here (params + moments, a pure column permutation) and
    # unpacked again at every save (parallel/tp.py).
    lm_cfg = model.lm_config
    lm_tp = mesh_model > 1
    if lm_tp:
        from clipcap_tpu.parallel.tp import pack_train_state

        state, lm_cfg = pack_train_state(state, lm_cfg)
        print(f"tensor parallelism: LM sharded over model axis "
              f"({mesh_model}-way, head-major qkv packing)")

    emb_ndim = 3 if encoder_config.use_windowed_embeddings else 2
    # Rematerialization policy: finetuning always needs it; prefix-only
    # needs it once per-chip batches are large (activation residuals OOM a
    # 16 GB chip around global batch 256 for gpt2 — measured). --remat
    # overrides in either direction.
    if args.remat is None:
        # Activations replicate over the model axis, so the per-chip
        # activation footprint is set by the DATA-axis shard — dividing by
        # all devices would under-count it by the model-parallel factor.
        n_data = max(1, len(devices) // max(1, mesh_model))
        per_chip = args.batch_size // n_data
        remat = args.train_language_model or per_chip >= 128
    else:
        remat = args.remat
    step_fn, state = make_train_step(
        mesh, state, tx, lm_cfg, model.mapper_config,
        prefix_length=model_config.prefix_length,
        embeddings_ndim=emb_ndim,
        dtype=compute_dtype,
        remat=remat,
        zero1=zero1,
        freeze_lm=not args.train_language_model,
        lm_tp=lm_tp,
    )

    def ckpt_view(s):
        """State as checkpoints store it: canonical qkv layout, host
        numpy.  Multi-host: ZeRO-1 shards are not host-addressable, so the
        state is first resharded fully-replicated (a collective EVERY
        process must enter, even though only process 0 writes)."""
        if pc > 1:
            from clipcap_tpu.parallel.mesh import replicated

            rep = replicated(mesh)
            gather = jax.jit(
                lambda t: t,
                out_shardings=jax.tree_util.tree_map(lambda _: rep, s))
            s = gather(s)
        if not lm_tp:
            return jax.device_get(s)

        from clipcap_tpu.parallel.tp import unpack_train_state

        plain, _ = unpack_train_state(jax.device_get(s), lm_cfg)
        return plain

    # Only the main process touches the checkpoint directory (concurrent
    # same-path writes on a pod's shared filesystem corrupt npz files);
    # every process still computes the save-epoch condition so the
    # replication gather inside ckpt_view stays collective.
    save_freq = max(1, args.checkpoint_save_frequency)
    checkpoint_saver = None
    if is_main:
        checkpoint_saver = CheckpointSaver(
            model_config,
            output_folder=args.output_folder,
            filename_prefix=str(args.checkpoint_filename_prefix),
            save_every_n_epochs=args.checkpoint_save_frequency,
        )

    logger = None
    if args.enable_wandb and is_main:
        try:
            import wandb

            logger = wandb.init(project=args.wandb_project, config=model_config.to_dict())
        except Exception as e:  # wandb not installed / offline
            print(f"wandb disabled ({e})")

    n_data = mesh.shape["data"]
    if pc > 1:
        # Per-step global batch assembly: each process supplies its local
        # [local_batch] share; jax assembles the [batch_size] global array
        # over the data axis (SCALING.md "per-host input pipelines").
        from jax.sharding import NamedSharding, PartitionSpec as P

        tok_sh = NamedSharding(mesh, P("data", None))
        emb_sh = NamedSharding(mesh, P("data", *([None] * (emb_ndim - 1))))

        def to_global(tokens, embeds):
            return (jax.make_array_from_process_local_data(tok_sh, tokens),
                    jax.make_array_from_process_local_data(emb_sh, embeds))

    def pad_to_mesh(tokens, embeds):
        """Round the global batch up to a multiple of the data axis; padded
        rows are all-pad tokens and carry zero loss weight."""
        b = tokens.shape[0]
        rem = (-b) % n_data
        if rem:
            tokens = np.concatenate(
                [tokens, np.full((rem, tokens.shape[1]), -1, tokens.dtype)])
            embeds = np.concatenate(
                [embeds, np.zeros((rem,) + embeds.shape[1:], embeds.dtype)])
        return tokens, embeds

    # --profile-dir: capture a jax.profiler trace of steps 2..4 (step 1 is
    # compile) for TensorBoard/xprof — the tracing subsystem the reference
    # lacks (SURVEY.md §5.1).
    from clipcap_tpu.utils.profiling import trace

    profile_steps = range(2, 5) if args.profile_dir else ()

    t0 = time.time()
    seen = 0
    # Host-side step mirror: state.step increments by exactly 1 per call,
    # so tracking it in Python avoids a device->host sync per iteration
    # (the int() fetch blocks dispatch and idles the TPU for the host-loop
    # latency every step); the device scalar is only fetched on logging
    # steps, where the loss fetch synchronizes anyway.
    host_step = int(state.step)
    for epoch in range(args.epochs):
        for tokens, embeds in dataloader:
            if pc > 1:
                tokens, embeds = to_global(tokens, embeds)
            else:
                tokens, embeds = pad_to_mesh(tokens, embeds)
                tokens, embeds = jnp.asarray(tokens), jnp.asarray(embeds)
            will_profile = host_step + 1 in profile_steps
            with trace(args.profile_dir if will_profile else None):
                state, metrics = step_fn(state, tokens, embeds)
            seen += tokens.shape[0] // max(1, pc)
            host_step += 1
            step = host_step
            if step % args.logging_frequency == 0:
                loss = float(metrics["loss"])
                if is_main:
                    rate = seen * pc / max(time.time() - t0, 1e-9)
                    print(f"epoch {epoch} step {step} loss {loss:.4f} "
                          f"({rate:.1f} samples/s)")
                if logger is not None:
                    logger.log({"loss": loss, "epoch": epoch, "samples_per_sec": rate}, step=step)
        view = None
        if (epoch + 1) % save_freq == 0:
            view = ckpt_view(state)  # collective: ALL processes enter
        if is_main and view is not None:
            saved = checkpoint_saver.on_epoch_end(epoch, view)
            if saved:
                print(f"checkpoint: {saved}")

    view = ckpt_view(state)
    if is_main:
        final = checkpoint_saver.save_final_checkpoint(view)
        print(f"final checkpoint: {final}")
    del view
    if logger is not None:
        logger.finish()
    return 0


def start_training() -> int:
    from clipcap_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()  # multi-host pods; no-op on a single host
    parser = ArgumentParser(description=__doc__, formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_training_args(parser)
    parser = add_model_args(parser)
    args = parser.parse_args()
    return train(args)


if __name__ == "__main__":
    exit(start_training())

"""Training/eval epoch driver (TPU-native rebuild of ref: unet_zoo/utils/training_loop.py).

Replicates the reference's observable behavior — epoch train/val, Dice
metric, early stopping (mode max), Dice-plateau LR scheduling, per-epoch
checkpoints, console/file/TensorBoard logging cadence — with a TPU-shaped
execution model:

* one jit'd train_step/eval_step per model (loss + grads + clip + AdamW +
  Dice in one XLA program; see train/steps.py)
* metrics accumulate as device scalars; the host syncs only at logging
  boundaries, not per batch (the reference pays an .item() sync every
  batch, ref :123-124)
* best AND last checkpoints are written every improvement/epoch via orbax
  (fixing quirk Q1 — the reference never writes *_best)
* optional Mesh: batches are sharded over the 'data' axis, parameters
  replicated; XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_zoo_tpu.config import Config
from unet_zoo_tpu.models import ZooModel
from unet_zoo_tpu.parallel import batch_sharding, replicate_state
from unet_zoo_tpu.train.early_stopping import EarlyStopping
from unet_zoo_tpu.train.losses import bce_with_logits, get_criterion
from unet_zoo_tpu.train.lr_scheduler import DiceScheduler
from unet_zoo_tpu.train.steps import (
    TrainState,
    create_train_state,
    get_lr,
    make_eval_step,
    make_train_step,
    set_lr,
    variables_of,
)
from unet_zoo_tpu.utils.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)
from unet_zoo_tpu.utils.logger import Logger


def _make_writer(log_dir: str):
    """TensorBoard writer: torch's if importable, else the dependency-free
    event writer (never silently drops TB logging — the reference always
    logs to TB, ref: utils/training_loop.py:203-204)."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir)
    except Exception:
        from unet_zoo_tpu.utils.tb_writer import EventFileWriter

        return EventFileWriter(log_dir)


def _epoch_mean(acc: List[jnp.ndarray]) -> float:
    if not acc:
        return 0.0
    return float(jnp.mean(jnp.stack(acc)))


def train_one_epoch(train_step, state: TrainState, dataloader, epoch: int,
                    model_name: str, writer, logger: Logger,
                    sharding=None) -> Tuple[TrainState, float, float, float]:
    import time

    from unet_zoo_tpu.data.loader import prefetch_to_device

    losses, dices = [], []
    steps_per_epoch = len(dataloader)
    n_images = 0
    t0 = time.perf_counter()
    batches = prefetch_to_device(dataloader, size=2, sharding=sharding)
    bar = None
    try:  # tqdm console progress (ref :108); auto-off on non-TTY
        from tqdm import tqdm

        bar = tqdm(total=steps_per_epoch, disable=None, leave=False,
                   desc=f"{model_name} epoch {epoch + 1}", unit="batch")
    except ImportError:
        pass
    for idx, (imgs, masks, _) in enumerate(batches):
        state, metrics = train_step(state, imgs, masks)
        losses.append(metrics["loss"])
        dices.append(metrics["dice"])
        n_images += int(imgs.shape[0])
        if bar is not None:
            bar.update(1)

        if idx % 50 == 0:  # file-log cadence (ref :126-136)
            # the float() casts are the loop's only per-50-batch host sync;
            # the tqdm postfix rides the same values at the same cadence
            logger.log_file_only(
                f"{model_name} - Batch {idx}: Loss={float(metrics['loss']):.4f}, "
                f"Dice={float(metrics['dice']):.4f}"
            )
            if bar is not None:
                bar.set_postfix(loss=f"{float(metrics['loss']):.4f}",
                                dice=f"{float(metrics['dice']):.4f}")
        if idx % 100 == 0:  # TB cadence (ref :138-141)
            global_step = epoch * steps_per_epoch + idx
            writer.add_scalar(f"Batch/{model_name}_Train_Loss",
                              float(metrics["loss"]), global_step)
            writer.add_scalar(f"Batch/{model_name}_Train_Dice",
                              float(metrics["dice"]), global_step)
    if bar is not None:
        bar.close()
    mean_loss, mean_dice = _epoch_mean(losses), _epoch_mean(dices)
    # _epoch_mean forces a device sync, so the clock below covers the full
    # epoch's compute, not just dispatch — honest loader+step throughput
    ips = n_images / max(time.perf_counter() - t0, 1e-9)
    return state, mean_loss, mean_dice, ips


def validate_one_epoch(eval_step, variables, dataloader, model_name: str,
                       logger: Logger, sharding=None) -> Tuple[float, float]:
    from unet_zoo_tpu.data.loader import prefetch_to_device

    losses, dices = [], []
    for imgs, masks, _ in prefetch_to_device(dataloader, size=2,
                                             sharding=sharding):
        metrics = eval_step(variables, imgs, masks)
        losses.append(metrics["loss"])
        dices.append(metrics["dice"])
    return _epoch_mean(losses), _epoch_mean(dices)


def train_model(
    model: ZooModel,
    train_dataloader,
    val_dataloader,
    config: Config,
    model_name: str,
    best_checkpoint_path: str,
    last_checkpoint_path: str,
    logger: Logger,
    mesh=None,
    rng: Optional[jax.Array] = None,
    state: Optional[TrainState] = None,
    resume: bool = False,
) -> Tuple[List[float], List[float], List[float], List[float], bool]:
    """Full training run for one model (ref train_model :182-285).

    ``resume=True`` restores params, optimizer state, step, LR-scheduler
    and early-stopping state from ``last_checkpoint_path`` and continues
    from the saved epoch (true resume — the reference cannot do this, it
    only stores bare weights; SURVEY.md §5).
    """
    tb_dir = os.path.join(config.TENSORBOARD_BASE_DIR,
                          model_name.replace(" ", "_").lower())
    writer = _make_writer(tb_dir)
    logger.log_both(f"TensorBoard logs for {model_name} will be saved to: {tb_dir}")

    early_stopping = EarlyStopping(
        patience=config.EARLY_STOPPING_PATIENCE, min_delta=0.0,
        restore_best_weights=True, verbose=True, mode="max")
    dice_scheduler = DiceScheduler(
        lr=config.LEARNING_RATE, patience=config.LR_SCHEDULER_PATIENCE,
        factor=config.LR_SCHEDULER_FACTOR, min_lr=config.MIN_LR,
        min_delta=0.0, verbose=True, mode="max")

    start_epoch = 0
    if state is None:
        rng = rng if rng is not None else jax.random.PRNGKey(
            getattr(config, "SEED", 0))
        sample = model.dummy_input(batch=1, image_size=config.IMAGE_SIZE)
        state = create_train_state(
            model, rng, sample, learning_rate=config.LEARNING_RATE,
            weight_decay=config.WEIGHT_DECAY,
            max_grad_norm=config.MAX_GRAD_NORM)

    if resume and checkpoint_exists(last_checkpoint_path):
        target = {
            "variables": variables_of(state),
            "opt_state": state.opt_state,
            "step": 0,
        }
        restored = load_checkpoint(last_checkpoint_path, target)
        variables = restored["variables"]
        state = state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        if "scheduler" in restored:
            dice_scheduler.load_state_dict(restored["scheduler"])
        if "early_stopping" in restored:
            early_stopping.load_state_dict(restored["early_stopping"])
            # best weights live in the best checkpoint, not last
        start_epoch = int(restored.get("meta", {}).get("epoch", 0))
        logger.log_both(
            f"Resumed {model_name} from {last_checkpoint_path} at epoch "
            f"{start_epoch} (step {int(state.step)}, lr {dice_scheduler.lr:.2e})")
        state = set_lr(state, dice_scheduler.lr)

    sharding = None
    spatial = False
    if mesh is not None:
        # gpu.multi_gpu_strategy (ref config.py:30, parsed but unused by
        # the reference beyond DataParallel) selects the parameter
        # placement; except under `spatial`, the batch is sharded over the
        # mesh's 'data' axis and GSPMD inserts the collectives. All six
        # axes are YAML-reachable: DataParallel | fsdp | tensor_parallel |
        # expert | pipeline | spatial.
        strategy = str(getattr(config, "MULTI_GPU_STRATEGY",
                               "DataParallel")).lower()
        if strategy in ("fsdp", "zero3"):
            from unet_zoo_tpu.parallel import shard_state_fsdp

            state = shard_state_fsdp(mesh, state)
        elif strategy in ("tensor_parallel", "tp", "megatron"):
            from unet_zoo_tpu.parallel import shard_state_tp

            state = shard_state_tp(mesh, state)
        elif strategy in ("expert", "expert_parallel", "ep", "moe"):
            # Switch-MoE expert weights sharded over the 'model' axis
            # (GShard placement), DP over 'data' — for the MoE members
            # (unext_moe); non-MoE params are simply replicated, so a
            # mixed zoo list still runs.
            from unet_zoo_tpu.parallel import shard_state_ep

            if mesh.shape.get("model", 1) < 2:
                raise ValueError(
                    "multi_gpu_strategy: expert needs tpu.model_parallel_"
                    "size >= 2 (the mesh axis the experts shard over)")
            state = shard_state_ep(mesh, state)
        elif strategy in ("pipeline", "pp", "gpipe"):
            n_stages = mesh.shape.get("model", 1)
            n_mb = int(getattr(config, "PIPELINE_MICROBATCHES", 4))
            if n_stages < 2:
                raise ValueError(
                    "multi_gpu_strategy: pipeline needs tpu.model_"
                    "parallel_size >= 2 (one bridge stage per 'model'-"
                    "axis device)")
            if config.BATCH_SIZE % n_mb or (
                    config.BATCH_SIZE // n_mb) % mesh.shape["data"]:
                raise ValueError(
                    f"pipeline: batch_size {config.BATCH_SIZE} must split "
                    f"into {n_mb} microbatches (tpu.pipeline_microbatches)"
                    f" divisible by the {mesh.shape['data']}-way 'data' "
                    "axis")
            # rebuilds the step functions below around the pipelined
            # module; variables/checkpoints are unchanged
            model = model.with_bridge_pipeline(
                mesh, num_microbatches=n_mb, batch_axis="data")
            state = replicate_state(mesh, state)
        elif strategy in ("spatial", "spatial_parallel", "sp"):
            from unet_zoo_tpu.parallel.spatial_unet import SPATIAL_TOPOLOGIES

            spatial = True
            n_sh = mesh.shape["data"]
            if model.name not in SPATIAL_TOPOLOGIES:
                raise ValueError(
                    f"multi_gpu_strategy: spatial supports "
                    f"{sorted(SPATIAL_TOPOLOGIES)} (halo-exchange "
                    f"topologies; parallel/spatial_models.py), not "
                    f"'{model.name}'")
            # per-shard H divisibility: 2**(levels of stride-2 downsampling)
            # — derived from the configured depth where the model has one
            # (a YAML depth: 6 attention_unet needs 32, not the default-
            # depth constant), else the topology's fixed constant
            depth_attr = getattr(model.module, "depth", None)
            if model.name == "unet_tpu":
                # s4 patchify stem x stride-2 downs between stages
                per_shard = 4 * 2 ** (len(model.module.widths) - 1)
            elif depth_attr:
                per_shard = 2 ** (int(depth_attr) - 1)
            else:
                per_shard = SPATIAL_TOPOLOGIES[model.name]
            div = per_shard * n_sh
            if config.IMAGE_SIZE % div:
                raise ValueError(
                    f"spatial: image_size {config.IMAGE_SIZE} must be "
                    f"divisible by {div} "
                    f"({per_shard} x {n_sh} H shards)")
            if getattr(config, "LOSS", "bce") != "bce":
                raise ValueError(
                    "spatial training uses the BCE-with-logits criterion "
                    "(training.loss: bce)")
            if getattr(config, "LOSS_KWARGS", {}):
                raise ValueError(
                    "spatial training does not take training.loss_kwargs "
                    "(the halo steps build the plain BCE criterion)")
            if int(getattr(config, "GRAD_ACCUM_STEPS", 1)) > 1:
                raise ValueError(
                    "spatial training does not support training.grad_"
                    "accum_steps > 1 (the halo train step has no "
                    "microbatch scan); unset it or use a data strategy")
            state = replicate_state(mesh, state)
        elif strategy in ("dataparallel", "data_parallel", "dp", "ddp"):
            state = replicate_state(mesh, state)
        else:
            raise ValueError(
                f"Unknown multi_gpu_strategy {strategy!r}: expected "
                "DataParallel, fsdp, tensor_parallel, expert, pipeline, "
                "or spatial")
        if spatial:
            from unet_zoo_tpu.parallel.spatial import spatial_sharding

            sharding = spatial_sharding(mesh)  # H-dim sharded, batch whole
        else:
            sharding = batch_sharding(mesh)
        logger.log_both(
            f"  Parallelism: {strategy} over mesh "
            f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # on-device augmentation is a *placement* modifier of AUGMENT, not an
    # independent switch: flips run in the train step only when both are on
    # (host-side flips are disabled by the scripts in exactly that case)
    # YAML-selected criterion (training: {loss, loss_kwargs}); 'bce' is the
    # reference-faithful default (ref: scripts/train.py:135)
    criterion = get_criterion(getattr(config, "LOSS", "bce"),
                              **getattr(config, "LOSS_KWARGS", {}))
    if getattr(config, "LOSS", "bce") != "bce":
        logger.log_both(
            f"  Loss: {config.LOSS} {getattr(config, 'LOSS_KWARGS', {}) or ''}")
    if spatial:
        # dedicated halo-exchange steps (parallel/spatial_unet.py):
        # same (state, imgs, masks)/(variables, imgs, masks) contracts,
        # so the epoch drivers run unchanged
        from unet_zoo_tpu.parallel.spatial_unet import (
            make_spatial_eval_step,
            make_spatial_train_step,
        )

        if (getattr(config, "AUGMENT", False)
                and getattr(config, "AUGMENT_ON_DEVICE", False)):
            raise ValueError(
                "spatial training does not support augment_on_device "
                "(flips would cross the H shards); use host-side augment")
        train_step = make_spatial_train_step(mesh, model_name=model.name)
        eval_step = make_spatial_eval_step(mesh, model_name=model.name)
    else:
        train_step = make_train_step(
            model, criterion=criterion,
            augment=(getattr(config, "AUGMENT", False)
                     and getattr(config, "AUGMENT_ON_DEVICE", False)),
            remat=model.train_remat,
            accum_steps=getattr(config, "GRAD_ACCUM_STEPS", 1))
        eval_step = make_eval_step(model, criterion=criterion)

    train_losses: List[float] = []
    train_dcs: List[float] = []
    val_losses: List[float] = []
    val_dcs: List[float] = []
    early_stopped = False

    logger.log_both(
        f"\nStarting training for {model_name} - {config.EPOCHS} epochs on "
        f"{config.get_device_info()}")
    logger.log_both(
        f"  Early Stopping: patience={config.EARLY_STOPPING_PATIENCE}, mode='max'")
    logger.log_both(
        f"  LR Scheduler: patience={config.LR_SCHEDULER_PATIENCE}, "
        f"factor={config.LR_SCHEDULER_FACTOR}, min_lr={config.MIN_LR}, mode='max'")

    epoch = start_epoch - 1
    for epoch in range(start_epoch, config.EPOCHS):
        state, train_loss, train_dc, train_ips = train_one_epoch(
            train_step, state, train_dataloader, epoch, model_name, writer,
            logger, sharding)
        train_losses.append(train_loss)
        train_dcs.append(train_dc)

        val_loss, val_dc = validate_one_epoch(
            eval_step, variables_of(state), val_dataloader, model_name, logger,
            sharding)
        val_losses.append(val_loss)
        val_dcs.append(val_dc)

        new_lr = dice_scheduler.step(val_dc, epoch + 1)
        if abs(new_lr - get_lr(state)) > 1e-12:
            state = set_lr(state, new_lr)

        improved = early_stopping.best_score is None or (
            val_dc > early_stopping.best_score)
        early_stopping(val_dc, variables_of(state), epoch + 1)
        if improved:
            save_checkpoint(best_checkpoint_path, {
                "variables": variables_of(state),
                "meta": {"epoch": epoch + 1, "val_dice": val_dc,
                         "model_name": model_name},
            })
        save_checkpoint(last_checkpoint_path, {
            "variables": variables_of(state),
            "opt_state": state.opt_state,
            "step": int(state.step),
            "meta": {"epoch": epoch + 1, "val_dice": val_dc,
                     "model_name": model_name},
            "scheduler": dice_scheduler.state_dict(),
            "early_stopping": early_stopping.state_dict(),
        })

        current_lr = get_lr(state)
        writer.add_scalar(f"Epoch/{model_name}_Train_Loss", train_loss, epoch + 1)
        writer.add_scalar(f"Epoch/{model_name}_Train_Dice", train_dc, epoch + 1)
        writer.add_scalar(f"Epoch/{model_name}_Val_Loss", val_loss, epoch + 1)
        writer.add_scalar(f"Epoch/{model_name}_Val_Dice", val_dc, epoch + 1)
        writer.add_scalar(f"{model_name}_Learning_Rate", current_lr, epoch + 1)

        epoch_log = "-" * 60
        epoch_log += f"\n{model_name} - Epoch {epoch + 1}/{config.EPOCHS}"
        epoch_log += f"\n  Train Loss: {train_loss:.6f} | Train DICE: {train_dc:.6f}"
        epoch_log += f"\n  Val Loss:   {val_loss:.6f} | Val DICE:   {val_dc:.6f}"
        epoch_log += f"\n  Learning Rate: {current_lr:.8f}"
        epoch_log += f"\n  Train throughput: {train_ips:.1f} img/s (loader + step)"
        epoch_log += f"\n  Best Val Dice: {early_stopping.get_best_score():.6f}"
        epoch_log += f"\n{'-' * 60}"
        logger.log_both(epoch_log)

        if early_stopping.early_stop:
            logger.log_both(
                f"\nEarly stopping triggered for {model_name} at epoch {epoch + 1}")
            logger.log_both(
                f"Best validation dice: {early_stopping.get_best_score():.6f}")
            early_stopped = True
            break

    writer.close()
    final = f"Training {'stopped early' if early_stopped else 'completed'} for {model_name}"
    final += f" after {epoch + 1 if early_stopped else config.EPOCHS} epochs"
    logger.log_both(final)
    logger.log_both(
        f"Best validation Dice coefficient for {model_name}: "
        f"{early_stopping.get_best_score():.6f}")
    return train_losses, train_dcs, val_losses, val_dcs, early_stopped


def evaluate_model(model: ZooModel, variables, test_dataloader,
                   model_name: str, logger: Logger,
                   sharding=None, criterion=bce_with_logits) -> Tuple[float, float]:
    """Test-set evaluation (ref evaluate_model :287-325)."""
    eval_step = make_eval_step(model, criterion=criterion)
    logger.log_both(f"\nEvaluating {model_name} on test set...")
    loss, dice = validate_one_epoch(eval_step, variables, test_dataloader,
                                    model_name, logger, sharding)
    logger.log_both(f"{model_name} - Final Test Loss: {loss:.4f}")
    logger.log_both(f"{model_name} - Final Test DICE: {dice:.4f}")
    return loss, dice

"""MPI-INF-3DHP entry point: train / evaluate with pose-selection exports and
the built-in Python PCK/AUC harness (MATLAB-free).

Orchestration parity with the reference main_3dhp.py: mm-scaled diffusion
(unit_scale=1000 instead of a cloned model file), pelvis(14)-rooted data,
valid-frame-masked metrics, per-TS cameras, inference_data_<mode>.mat exports
(main_3dhp.py:903-912). Where the reference then requires MATLAB
(README.md:55), this script finishes the job itself via
d3dp_tpu.metrics.pck_auc when annot data is available.
"""

import os
import sys
from datetime import datetime
from time import time

import numpy as np

from d3dp_tpu.cli.arguments import parse_args, apply_platform_args
from d3dp_tpu.data.mpi3dhp import (
    KPS_LEFT, KPS_RIGHT, ROOT_JOINT, load_train, load_test, make_synthetic)


def _build_models(args):
    import jax.numpy as jnp
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    import jax

    attn = args.attention
    on_tpu = jax.devices()[0].platform == "tpu"
    if attn == "auto":
        attn = "pallas" if on_tpu else "xla"
    # training: fp32 stays on the xla parity path; requesting bf16 opts into
    # the qualified fast path (PERFORMANCE.md bf16 qualification)
    train_attn = "pallas" if (
        args.attention == "pallas"
        or (args.attention == "auto" and on_tpu and args.dtype == "bfloat16")
    ) else "xla"
    mk_model = lambda dpr, impl="xla": MixSTEConfig(
        num_frames=args.number_of_frames, embed_dim=args.cs, depth=args.dep,
        drop_rate=args.dropout, drop_path_rate=dpr, dtype=dtype,
        attention_impl=impl, fuse_level=args.fuse_level)
    common = dict(
        timesteps=args.timestep, scale=args.scale,
        joints_left=tuple(KPS_LEFT), joints_right=tuple(KPS_RIGHT),
        flip_tta=args.test_time_augmentation,
        unit_scale=1000.0,  # 3DHP data is in millimetres
    )
    d3dp_train = D3DP(D3DPConfig(model=mk_model(0.1, train_attn), **common))
    d3dp_valid = D3DP(D3DPConfig(model=mk_model(0.0, attn), num_proposals=1,
                                 sampling_timesteps=1, **common))
    d3dp_eval = D3DP(D3DPConfig(model=mk_model(0.0, attn),
                                num_proposals=args.num_proposals,
                                sampling_timesteps=args.sampling_timesteps,
                                reuse_interval=max(args.ddim_reuse, 1),
                                reuse_tap=max(1, min(args.ddim_reuse_tap, args.dep)),
                                reuse_tau=args.ddim_reuse_adaptive,
                                **common))
    return d3dp_train, d3dp_valid, d3dp_eval


def _load_data(args):
    if args.dataset == "synthetic":
        return make_synthetic(seed=args.seed, frames=args.synthetic_frames)
    p3_train, p2_train = load_train()
    p3_test, p2_test, valid = load_test()
    return p3_train, p2_train, p3_test, p2_test, valid


def run_training(args, data, d3dp_train, d3dp_valid, params, writer=None,
                 mesh=None):
    import copy
    import jax
    import jax.numpy as jnp
    from d3dp_tpu.data.generators import ChunkedGenerator, UnchunkedGenerator
    from d3dp_tpu.eval.evaluator_3dhp import Evaluator3DHP
    from d3dp_tpu.parallel import (
        round_up_batch, shard_batch_fn, shard_model_params)
    from d3dp_tpu.train.state import (
        TrainState, make_optimizer, make_train_step, get_lr, set_lr)
    from d3dp_tpu.train.checkpoint_io import (
        save_checkpoint_any, wait_for_checkpoints)

    p3_train, p2_train, p3_test, p2_test, valid = data

    def _shard(p):
        return shard_model_params(p, mesh)

    lr = args.learning_rate
    tx = make_optimizer(lr, weight_decay=0.1)
    state = TrainState.create(_shard(params), tx, mesh=mesh)
    step = make_train_step(d3dp_train, tx, root_joint=ROOT_JOINT)

    train_generator = ChunkedGenerator(
        args.batch_size // args.stride, None, list(p3_train.values()),
        list(p2_train.values()), args.number_of_frames, shuffle=True,
        augment=args.data_augmentation, kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
        joints_left=KPS_LEFT, joints_right=KPS_RIGHT, pad_last=True)
    test_keys = list(p2_test.keys())
    test_generator = UnchunkedGenerator(
        None, [p3_test[k] for k in test_keys], [p2_test[k] for k in test_keys],
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT, joints_left=KPS_LEFT,
        joints_right=KPS_RIGHT,
        valid_frames=[valid[k] for k in test_keys], keys=test_keys)
    print(f"INFO: Training on {sum(p.shape[0] for p in p2_train.values())} frames")

    validator = Evaluator3DHP(
        d3dp_valid, receptive_field=args.number_of_frames,
        batch_size=round_up_batch(args.eval_batch_size or 2, mesh),
        quickdebug=args.debug, mesh=mesh)

    epoch, min_loss = 0, args.min_loss
    key = jax.random.PRNGKey(args.seed)
    log_path = os.path.join(args.checkpoint, "training_log.txt")

    # full resume: epoch, optimizer, lr, generator RNG (reference
    # main_3dhp.py:377-385); run_with_args already restored the weights
    if args.resume:
        from d3dp_tpu.train.checkpoint_io import load_any

        ckpt = load_any(os.path.join(args.checkpoint, args.resume),
                        depth=args.dep)
        epoch = ckpt["epoch"]
        if ckpt.get("opt_state") is not None:
            from d3dp_tpu.train.checkpoint_io import restore_opt_state

            # leaves matched positionally onto the live treedef + shardings
            state = state.replace(opt_state=restore_opt_state(
                state.opt_state, ckpt["opt_state"]))
            if ckpt.get("random_state") is not None:
                train_generator.set_random_state(ckpt["random_state"])
        else:
            print("WARNING: this checkpoint does not contain an optimizer "
                  "state. The optimizer will be reinitialized.")
        if not args.coverlr and ckpt.get("lr") is not None:
            lr = ckpt["lr"]
        state = state.replace(opt_state=set_lr(state.opt_state, lr))
        if ckpt.get("min_loss") is not None:
            min_loss = ckpt["min_loss"]

    while epoch < args.epochs:
        start_time = time()
        step_losses, step_weights = [], []
        from d3dp_tpu.data.prefetch import Prefetcher, device_put_batches

        # under a mesh, batches are dp-sharded (weight-0 padded to a dp
        # multiple); weights stay host-side either way: their sum is the
        # step count and must not force a device sync
        to_device = (shard_batch_fn(mesh) if mesh is not None
                     else device_put_batches(1, 2))
        if args.input_pipeline == "grain":
            from d3dp_tpu.data.grain_pipeline import GrainChunkedPipeline

            batches = GrainChunkedPipeline(
                train_generator, to_device=to_device).next_epoch()
        else:
            batches = Prefetcher(
                train_generator.next_epoch(), to_device=to_device, depth=2)
        for batch in batches:
            _, b3, b2, w = batch
            key, sub = jax.random.split(key)
            state, loss = step(
                state, sub, jnp.asarray(b2), jnp.asarray(b3), jnp.asarray(w))
            step_losses.append(loss)
            step_weights.append(int(w.sum()) * args.number_of_frames)
            if args.debug:
                break
        losses_np = np.asarray(jnp.stack(step_losses))
        weights_np = np.asarray(step_weights, dtype=np.float64)
        train_loss = float((losses_np * weights_np).sum()) / float(weights_np.sum())

        valid_pbest = None
        if not args.no_eval:
            key, sub = jax.random.split(key)
            results, _ = validator.evaluate(state.params, test_generator, sub)
            valid_pbest = float(results["P_Best"][0])

        elapsed = (time() - start_time) / 60
        lr = get_lr(state.opt_state)
        msg = "[%d] time %.2f lr %f 3d_train %f" % (
            epoch + 1, elapsed, lr, train_loss)
        if valid_pbest is not None:
            msg += " 3d_pos_valid %f" % valid_pbest
        print(msg)
        with open(log_path, "a") as f:
            f.write(msg + "\n")
        if writer is not None:
            writer.add_scalar("Loss/3d training loss", train_loss, epoch + 1)
            if valid_pbest is not None:
                writer.add_scalar("Loss/3d validation loss", valid_pbest,
                                  epoch + 1)
            writer.add_scalar("Parameters/learning rate", lr, epoch + 1)

        lr *= args.lr_decay
        state = state.replace(opt_state=set_lr(state.opt_state, lr))
        epoch += 1

        ckpt_ext = "orbax" if args.ckpt_format == "orbax" else "ckpt"

        def _save(path):
            save_checkpoint_any(
                path, args.ckpt_format, epoch=epoch, lr=lr,
                params=state.params,
                opt_state=state.opt_state,
                generator_random_state=copy.deepcopy(
                    train_generator.random_state()),
                min_loss=min_loss,
                wait=False)

        if epoch % args.checkpoint_frequency == 0:
            chk_path = os.path.join(args.checkpoint, f"epoch_{epoch}.{ckpt_ext}")
            print("Saving checkpoint to", chk_path)
            _save(chk_path)
        if valid_pbest is not None and valid_pbest < min_loss:
            min_loss = valid_pbest
            print("save best checkpoint")
            _save(os.path.join(args.checkpoint, f"best_epoch.{ckpt_ext}"))
    wait_for_checkpoints()  # drain pending async orbax saves before exit
    return state


def run_evaluation(args, data, d3dp_eval, params, key, noise_provider=None,
                   mesh=None):
    from d3dp_tpu.data.generators import UnchunkedGenerator
    from d3dp_tpu.eval.evaluator_3dhp import Evaluator3DHP
    from d3dp_tpu.parallel import round_up_batch

    _, _, p3_test, p2_test, valid = data
    test_keys = list(p2_test.keys())
    test_generator = UnchunkedGenerator(
        None, [p3_test[k] for k in test_keys], [p2_test[k] for k in test_keys],
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT, joints_left=KPS_LEFT,
        joints_right=KPS_RIGHT,
        valid_frames=[valid[k] for k in test_keys], keys=test_keys)

    eval_bs = round_up_batch(args.eval_batch_size or 2, mesh)
    if mesh is not None and eval_bs != (args.eval_batch_size or 2):
        print(f"INFO: eval batch size rounded up to {eval_bs} (multiple of "
              f"the dp={mesh.shape['dp']} mesh axis)")
    evaluator = Evaluator3DHP(
        d3dp_eval, receptive_field=args.number_of_frames,
        batch_size=eval_bs, quickdebug=args.debug, mesh=mesh)
    results, exports = evaluator.evaluate(
        params, test_generator, key, export_dir=args.checkpoint,
        noise_provider=noise_provider)

    log_path = os.path.join(
        args.checkpoint,
        f"3dhp_test_log_H{args.num_proposals}_K{args.sampling_timesteps}.txt")
    with open(log_path, "a") as f:
        for ii in range(len(results["P_Best"])):
            for mode in ("P_Best", "P_Agg"):
                msg = "step %d : Protocol #1 Error (MPJPE) %s: %f mm" % (
                    ii, mode, results[mode][ii])
                print(msg)
                f.write(msg + "\n")

    # MATLAB-free final stage: PCK/AUC when annot data is present
    annot_dir = os.path.join("3dhp_test")
    if os.path.isdir(os.path.join(annot_dir, "TS1")):
        from d3dp_tpu.metrics.pck_auc import evaluate_3dhp_mat

        for mode in ("P_Agg", "P_Best", "J_Best", "J_Agg"):
            summaries = evaluate_3dhp_mat(
                exports[mode], annot_dir, mode, args.checkpoint,
                n_seq=len(test_keys))
            last = max(summaries)
            print(f"{mode}: MPJPE {summaries[last]['mpjpe']:.2f} mm, "
                  f"PCK {summaries[last]['pck']:.2f}, "
                  f"AUC {summaries[last]['auc']:.2f} (t{last})")
    else:
        print("INFO: 3dhp_test/TS*/annot_data.mat not found; "
              "inference_data_<mode>.mat exported for external evaluation.")
    return results


def main(argv=None):
    args = parse_args(argv)
    apply_platform_args(args)

    import jax
    from d3dp_tpu.utils.logging import Logger
    from d3dp_tpu.train.checkpoint_io import load_any

    TIMESTAMP = "{0:%Y%m%dT%H-%M-%S}".format(datetime.now())
    writer = None
    if not args.nolog:
        from d3dp_tpu.utils.logging import TensorBoardWriter

        logdir = args.log + "_" + TIMESTAMP
        os.makedirs(logdir, exist_ok=True)
        writer = TensorBoardWriter(logdir)
        writer.add_text("command", "python " + " ".join(sys.argv))
        sys.stdout = Logger(os.path.join(logdir, "logging.log"))
    print("Evaluate!" if args.evaluate else "Train!")
    print("JAX devices:", jax.devices())

    if args.checkpoint == "":
        args.checkpoint = args.log + "_" + TIMESTAMP
    os.makedirs(args.checkpoint, exist_ok=True)

    print("Loading dataset...")
    data = _load_data(args)

    d3dp_train, d3dp_valid, d3dp_eval = _build_models(args)
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = d3dp_train.init_params(init_key)
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print("INFO: Trainable parameter count:", n_params / 1e6, "Million")

    if args.resume in ("auto", "latest"):
        from d3dp_tpu.train.checkpoint_io import latest_checkpoint

        found = latest_checkpoint(args.checkpoint)
        args.resume = os.path.basename(found) if found else ""
        print("Auto-resume:", args.resume or "(no checkpoint found)")

    if args.resume or args.evaluate:
        chk_filename = os.path.join(
            args.checkpoint, args.resume if args.resume else args.evaluate)
        print("Loading checkpoint", chk_filename)
        ckpt = load_any(chk_filename, depth=args.dep)
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])

    # multi-device by default, mirroring the reference's unconditional
    # DataParallel wrap (main_3dhp.py:257-264)
    from d3dp_tpu.parallel import auto_mesh, shard_model_params

    mesh = auto_mesh(args.dp, args.tp)
    if mesh is not None:
        print(f"INFO: {mesh.devices.size}-device mesh "
              f"(dp={mesh.shape['dp']}, tp={mesh.shape['tp']})")

    if args.evaluate:
        print("Evaluating...")
        params = shard_model_params(params, mesh)
        key, sub = jax.random.split(key)
        run_evaluation(args, data, d3dp_eval, params, sub, mesh=mesh)
    else:
        run_training(args, data, d3dp_train, d3dp_valid, params,
                     writer=writer, mesh=mesh)
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()

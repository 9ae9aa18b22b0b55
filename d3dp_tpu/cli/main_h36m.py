"""Human3.6M entry point: train / evaluate / render.

Orchestration parity with the reference main.py (train loop :304-592,
evaluate :596-794, action-wise driver :952-1046), re-structured as functions
instead of a 1000-line module-level script, sharing one core with the other
entry points.
"""

import os
import sys
from datetime import datetime
from time import time

import numpy as np

from d3dp_tpu.cli.arguments import parse_args, apply_platform_args
from d3dp_tpu.cli.data_prep import prepare_data, fetch


def _build_models(args, data):
    """Train-config and eval-config D3DP sharing one weight pytree.

    (reference: 3 D3DP instances, main.py:228-230)
    """
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
    # the qualified fast path (PERFORMANCE.md: 22-epoch trajectory parity on
    # structured synthetic + flagship grad cosine 0.99982 vs fp32+xla)
    train_attn = "pallas" if (
        args.attention == "pallas"
        or (args.attention == "auto" and on_tpu and args.dtype == "bfloat16")
    ) else "xla"
    if args.attention == "auto" and train_attn == "pallas":
        print("INFO: --attention auto with --dtype bfloat16 on TPU selects "
              "the Pallas training path (qualified in PERFORMANCE.md; pass "
              "--attention xla to keep the XLA kernels).")
    mk_model = lambda dpr, impl="xla": MixSTEConfig(
        num_frames=args.number_of_frames,
        num_joints=data.num_joints,
        embed_dim=args.cs,
        depth=args.dep,
        drop_rate=args.dropout,
        drop_path_rate=dpr,
        dtype=dtype,
        attention_impl=impl,
        fuse_level=args.fuse_level,
    )
    common = dict(
        timesteps=args.timestep,
        scale=args.scale,
        joints_left=tuple(data.joints_left),
        joints_right=tuple(data.joints_right),
        flip_tta=args.test_time_augmentation,
    )
    d3dp_train = D3DP(D3DPConfig(model=mk_model(0.1, train_attn), **common))
    # end-of-epoch validation model: H=1, K=1 (main.py:229)
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


def _log_path(args):
    return os.path.join(
        args.checkpoint,
        f"h36m_test_log_H{args.num_proposals}_K{args.sampling_timesteps}.txt",
    )


def _print_and_log(f, msg):
    print(msg)
    if f is not None:
        f.write(msg + "\n")


def report_result(args, result, action=None):
    """Per-action report, reference format (main.py:745-789)."""
    with open(_log_path(args), "a") as f:
        if action is None:
            print("----------")
        else:
            _print_and_log(f, "----" + action + "----")
        e1 = result.averages_mm()
        e2 = result.averages_p2_mm() if args.p2 else None
        K = len(e1["P_Best"])
        for ii in range(K):
            for mode in ("J_Best", "P_Best", "P_Agg", "J_Agg"):
                _print_and_log(
                    f,
                    "step %d : Protocol #1 Error (MPJPE) %s: %f mm"
                    % (ii, mode, e1[mode][ii]),
                )
            if e2 is not None:
                for mode in ("J_Best", "P_Best", "P_Agg", "J_Agg"):
                    _print_and_log(
                        f,
                        "step %d : Protocol #2 Error (MPJPE) %s: %f mm"
                        % (ii, mode, e2[mode][ii]),
                    )
        _print_and_log(f, "----------")


def run_evaluation(args, data, d3dp_eval, params, key, noise_provider=None,
                   mesh=None):
    """Action-wise evaluation driver. (reference: main.py:901-1046)

    `noise_provider` (optional) is forwarded to Evaluator.evaluate for
    deterministic replay of the reference's DDIM noise stream (the
    whole-pipeline parity harness, tests/test_pipeline_parity.py).

    `mesh` (optional): eval micro-batches shard over its 'dp' axis — the
    TPU-native replacement for the reference's DataParallel-wrapped eval
    models (main.py:241-248).
    """
    import jax
    from d3dp_tpu.data.generators import UnchunkedGenerator
    from d3dp_tpu.eval import Evaluator
    from d3dp_tpu.parallel import round_up_batch

    subjects_test = args.subjects_test.split(",")
    action_filter = None if args.actions == "*" else args.actions.split(",")

    all_actions = {}
    all_actions_by_subject = {}
    for subject in subjects_test:
        all_actions_by_subject[subject] = {}
        for action in data.actions_of(subject):
            action_name = action.split(" ")[0]
            all_actions.setdefault(action_name, []).append((subject, action))
            all_actions_by_subject[subject].setdefault(action_name, []).append(
                (subject, action))

    eval_bs = round_up_batch(args.eval_batch_size or args.batch_size, mesh)
    if eval_bs != (args.eval_batch_size or args.batch_size):
        print(f"INFO: eval batch size rounded up to {eval_bs} (multiple of "
              f"the dp={mesh.shape['dp']} mesh axis; extra rows are weight-0 "
              "padding windows)")
    evaluator = Evaluator(
        d3dp_eval,
        receptive_field=args.number_of_frames,
        batch_size=eval_bs,
        kps_left=data.kps_left,
        kps_right=data.kps_right,
        p2=args.p2,
        p2_device=args.p2_device,
        quickdebug=args.debug,
        mesh=mesh,
    )

    def fetch_actions(actions):
        out_p3, out_p2, out_cam = [], [], []
        for subject, action in actions:
            for p in data.keypoints[subject][action]:
                out_p2.append(p)
            poses_3d = data.poses_3d[subject][action]
            assert len(poses_3d) == len(data.keypoints[subject][action])
            for p in poses_3d:
                out_p3.append(p)
            for cam in data.cameras[subject]:
                if "intrinsic" in cam:
                    out_cam.append(cam["intrinsic"])
        if args.downsample > 1:
            s = args.downsample
            out_p2 = [p[::s] for p in out_p2]
            out_p3 = [p[::s] for p in out_p3]
        return out_cam, out_p3, out_p2

    def eval_actions(actions_map):
        per_action = {}
        for action_key in actions_map:
            if action_filter is not None and not any(
                action_key.startswith(a) for a in action_filter
            ):
                continue
            cams, p3, p2 = fetch_actions(actions_map[action_key])
            # augment=False: flip TTA is fused inside the sampler
            # (diffusion/d3dp.py ddim_sample_flip), not done by yielding a
            # flipped duplicate sequence like the reference's set_augment path.
            gen = UnchunkedGenerator(
                cams, p3, p2, augment=False,
                kps_left=data.kps_left, kps_right=data.kps_right,
                joints_left=data.joints_left, joints_right=data.joints_right,
            )
            # stable per-action key (hash() is salted per process)
            import zlib

            action_key_int = zlib.crc32(action_key.encode()) % (2**31)
            if args.profile and not per_action:  # trace the first action
                from d3dp_tpu.utils.profiling import trace as profiler_trace

                with profiler_trace(args.profile):
                    result = evaluator.evaluate(
                        params, gen, jax.random.fold_in(key, action_key_int),
                        noise_provider=noise_provider)
                    # EvalResult defers device syncs — force completion
                    # INSIDE the trace or the queued sampling is invisible
                    result.averages_mm()
                print(f"profiler trace written to {args.profile}")
            else:
                result = evaluator.evaluate(
                    params, gen, jax.random.fold_in(key, action_key_int),
                    noise_provider=noise_provider)
            report_result(args, result, action_key)
            per_action[action_key] = result

        # action-wise averages (main.py:998-1046)
        with open(_log_path(args), "a") as f:
            modes = ("J_Best", "P_Best", "P_Agg", "J_Agg")
            avg = {
                m: np.mean([r.averages_mm()[m] for r in per_action.values()], axis=0)
                for m in modes
            }
            K = len(avg["P_Best"])
            for ii in range(K):
                for m in modes:
                    _print_and_log(
                        f,
                        "step %d Protocol #1   (MPJPE) action-wise average "
                        "%s: %f mm" % (ii, m, avg[m][ii]),
                    )
            if args.p2:
                avg2 = {
                    m: np.mean(
                        [r.averages_p2_mm()[m] for r in per_action.values()], axis=0)
                    for m in modes
                }
                for ii in range(K):
                    for m in modes:
                        _print_and_log(
                            f,
                            "step %d Protocol #2   (MPJPE) action-wise average "
                            "%s: %f mm" % (ii, m, avg2[m][ii]),
                        )
        return per_action

    if not args.by_subject:
        return eval_actions(all_actions)
    results = {}
    for subject in all_actions_by_subject:
        print("Evaluating on subject", subject)
        results[subject] = eval_actions(all_actions_by_subject[subject])
        print("")
    return results


def run_training(args, data, d3dp_train, d3dp_valid, params, writer,
                 resume_ckpt=None, mesh=None):
    """Training loop. (reference: main.py:304-592)

    `mesh` (optional): train batches shard over its 'dp' axis and the
    params/optimizer state over its 'tp' rules — the TPU-native
    replacement for the reference's DataParallel training (main.py:241-248,
    scatter/gather replaced by GSPMD collectives over ICI)."""
    import copy
    import jax
    import jax.numpy as jnp
    from d3dp_tpu.data.generators import ChunkedGenerator, UnchunkedGenerator
    from d3dp_tpu.eval import Evaluator
    from d3dp_tpu.parallel import (
        round_up_batch, shard_batch_fn, shard_model_params)
    from d3dp_tpu.train.state import (
        TrainState, make_optimizer, make_train_step, get_lr, set_lr)
    from d3dp_tpu.train.checkpoint_io import (
        save_checkpoint_any, load_any, restore_opt_state,
        wait_for_checkpoints)

    def _shard(p):
        return shard_model_params(p, mesh)

    subjects_train = args.subjects_train.split(",")
    subjects_test = args.subjects_test.split(",")
    action_filter = None if args.actions == "*" else args.actions.split(",")

    cams_train, poses_train, poses_train_2d = fetch(
        data, subjects_train, action_filter, subset=args.subset,
        downsample=args.downsample)
    cams_valid, poses_valid, poses_valid_2d = fetch(
        data, subjects_test, action_filter, downsample=args.downsample)

    lr = args.learning_rate
    tx = make_optimizer(lr, weight_decay=0.1)
    # sharded params make optax init produce identically-sharded moments
    state = TrainState.create(_shard(params), tx, mesh=mesh)
    step = make_train_step(d3dp_train, tx)

    train_generator = ChunkedGenerator(
        args.batch_size // args.stride, cams_train, poses_train, poses_train_2d,
        args.number_of_frames, shuffle=True, augment=args.data_augmentation,
        kps_left=data.kps_left, kps_right=data.kps_right,
        joints_left=data.joints_left, joints_right=data.joints_right,
        pad_last=True,
    )
    test_generator = UnchunkedGenerator(
        cams_valid, poses_valid, poses_valid_2d, augment=False,
        kps_left=data.kps_left, kps_right=data.kps_right,
        joints_left=data.joints_left, joints_right=data.joints_right,
    )
    print(f"INFO: Training on {sum(p.shape[0] for p in poses_train_2d)} frames")
    print(f"INFO: Testing on {test_generator.num_frames()} frames")

    validator = Evaluator(
        d3dp_valid, receptive_field=args.number_of_frames,
        batch_size=round_up_batch(
            args.eval_batch_size or args.batch_size, mesh),
        kps_left=data.kps_left,
        kps_right=data.kps_right, quickdebug=args.debug, light=True,
        mesh=mesh,
    )

    epoch = 0
    min_loss = args.min_loss
    train_curve, valid_curve = [], []
    key = jax.random.PRNGKey(args.seed)

    if args.resume:
        ckpt = resume_ckpt or load_any(
            os.path.join(args.checkpoint, args.resume), depth=args.dep)
        epoch = ckpt["epoch"]
        state = TrainState.create(
            _shard(jax.tree_util.tree_map(jnp.asarray, ckpt["params"])), tx,
            mesh=mesh)
        if ckpt.get("opt_state") is not None:
            # leaves matched positionally onto the live treedef + shardings
            # (handles both pickle namedtuples and orbax dict trees)
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

    print("** Note: reported losses are averaged over all frames.")
    log_path = os.path.join(args.checkpoint, "training_log.txt")

    profiled = False
    while epoch < args.epochs:
        start_time = time()
        if args.profile and not profiled:
            from d3dp_tpu.utils.profiling import trace as profiler_trace
            profiled = True
            prof_cm = profiler_trace(args.profile)
            prof_cm.__enter__()
        epoch_loss, N = 0.0, 0
        quickdebug = args.debug

        # losses stay on device until epoch end — float() would force a
        # host sync every step and stall the dispatch pipeline
        step_losses, step_weights = [], []
        from d3dp_tpu.data.prefetch import Prefetcher, device_put_batches

        # under a mesh, batches are dp-sharded (and padded with weight-0
        # rows to a dp multiple); weights stay host-side either way: their
        # sum is the step count and must not force a device sync
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
            cam, b3, b2, w = batch
            key, sub = jax.random.split(key)
            state, loss = step(
                state, sub, jnp.asarray(b2), jnp.asarray(b3), jnp.asarray(w))
            n_chunks = int(w.sum())
            step_losses.append(loss)
            step_weights.append(n_chunks * args.number_of_frames)
            if quickdebug:
                break
        if args.profile and profiled and epoch == 0:
            prof_cm.__exit__(None, None, None)
            print(f"profiler trace written to {args.profile}")
        losses_np = np.asarray(jnp.stack(step_losses))
        weights_np = np.asarray(step_weights, dtype=np.float64)
        epoch_loss = float((losses_np * weights_np).sum())
        N = float(weights_np.sum())
        train_loss = epoch_loss / N

        valid_pbest = None
        if not args.no_eval:
            key, sub = jax.random.split(key)
            vres = validator.evaluate(state.params, test_generator, sub)
            valid_pbest = float(vres.averages_mm()["P_Best"][0])

        elapsed = (time() - start_time) / 60
        lr = get_lr(state.opt_state)
        if valid_pbest is None:
            msg = "[%d] time %.2f lr %f 3d_train %f" % (
                epoch + 1, elapsed, lr, train_loss * 1000)
        else:
            msg = "[%d] time %.2f lr %f 3d_train %f 3d_pos_valid %f" % (
                epoch + 1, elapsed, lr, train_loss * 1000, valid_pbest)
        print(msg)
        with open(log_path, "a") as f:
            f.write(msg + "\n")
        if writer is not None:
            writer.add_scalar("Loss/3d training loss", train_loss * 1000, epoch + 1)
            if valid_pbest is not None:
                writer.add_scalar("Loss/3d validation loss", valid_pbest, epoch + 1)
            writer.add_scalar("Parameters/learning rate", lr, epoch + 1)
            writer.add_scalar("Parameters/training time per epoch", elapsed, epoch + 1)

        # exponential lr decay (main.py:529-531)
        lr *= args.lr_decay
        state = state.replace(opt_state=set_lr(state.opt_state, lr))
        epoch += 1

        ckpt_ext = "orbax" if args.ckpt_format == "orbax" else "ckpt"

        def _save(path):
            import copy as _copy

            save_checkpoint_any(
                path,
                args.ckpt_format,
                epoch=epoch,
                lr=lr,
                params=state.params,
                opt_state=state.opt_state,
                generator_random_state=_copy.deepcopy(
                    train_generator.random_state()),
                min_loss=min_loss,
                wait=False,  # orbax: serialization overlaps the next epoch
            )

        if epoch % args.checkpoint_frequency == 0:
            chk_path = os.path.join(args.checkpoint, f"epoch_{epoch}.{ckpt_ext}")
            print("Saving checkpoint to", chk_path)
            _save(chk_path)

        if valid_pbest is not None and valid_pbest < min_loss:
            min_loss = valid_pbest
            print("save best checkpoint")
            _save(os.path.join(args.checkpoint, f"best_epoch.{ckpt_ext}"))
            with open(log_path, "a") as f:
                f.write("best epoch\n")

        train_curve.append(train_loss * 1000)
        if valid_pbest is not None:
            valid_curve.append(valid_pbest)
        # loss-curve PNGs (reference main.py:575-592)
        if args.export_training_curves and epoch > 3:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure()
            epoch_x = np.arange(3, len(train_curve)) + 1
            plt.plot(epoch_x, train_curve[3:], "--", color="C0")
            if len(valid_curve) > 3:
                plt.plot(epoch_x[: len(valid_curve) - 3], valid_curve[3:],
                         color="C1")
            plt.legend(["3d train", "3d valid (eval)"])
            plt.ylabel("MPJPE (mm)")
            plt.xlabel("Epoch")
            plt.xlim((3, epoch))
            plt.savefig(os.path.join(args.checkpoint, "loss_3d.png"))
            plt.close("all")

    wait_for_checkpoints()  # drain pending async orbax saves before exit
    return state


def main(argv=None):
    args = parse_args(argv)
    apply_platform_args(args)
    run_with_args(args)


def run_with_args(args):
    import jax
    from d3dp_tpu.utils.logging import Logger, TensorBoardWriter
    from d3dp_tpu.train.checkpoint_io import load_any

    description = "Evaluate!" if args.evaluate else "Train!"
    TIMESTAMP = "{0:%Y%m%dT%H-%M-%S}".format(datetime.now())

    writer = None
    if not args.nolog:
        logdir = args.log + "_" + TIMESTAMP
        os.makedirs(logdir, exist_ok=True)
        writer = TensorBoardWriter(logdir)
        writer.add_text("description", description)
        writer.add_text("command", "python " + " ".join(sys.argv))
        sys.stdout = Logger(os.path.join(logdir, "logging.log"))
    print(description)
    print("JAX devices:", jax.devices())

    if args.checkpoint == "":
        args.checkpoint = args.log + "_" + TIMESTAMP
    os.makedirs(args.checkpoint, exist_ok=True)

    print("Loading dataset...")
    data = prepare_data(args)

    d3dp_train, d3dp_valid, d3dp_eval = _build_models(args, data)
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = d3dp_train.init_params(init_key)

    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print("INFO: Trainable parameter count:", n_params / 1e6, "Million")
    print("INFO: Receptive field: {} frames".format(args.number_of_frames))

    if args.resume in ("auto", "latest"):
        from d3dp_tpu.train.checkpoint_io import latest_checkpoint

        found = latest_checkpoint(args.checkpoint)
        args.resume = os.path.basename(found) if found else ""
        print("Auto-resume:", args.resume or "(no checkpoint found)")

    loaded_ckpt = None
    if args.resume or args.evaluate:
        chk_filename = os.path.join(
            args.checkpoint, args.resume if args.resume else args.evaluate)
        print("Loading checkpoint", chk_filename)
        loaded_ckpt = load_any(chk_filename, depth=args.dep)
        print("This model was trained for {} epochs".format(
            loaded_ckpt.get("epoch")))
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, loaded_ckpt["params"])

    # multi-device by default, like the reference's unconditional
    # nn.DataParallel wrap (main.py:241-248): all visible devices form a
    # data-parallel mesh unless --dp/--tp say otherwise
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
    elif args.render:
        print("Rendering...")
        from d3dp_tpu.cli.render import run_render

        params = shard_model_params(params, mesh)
        run_render(args, data, d3dp_eval, params, key, mesh=mesh)
    else:
        run_training(args, data, d3dp_train, d3dp_valid, params, writer,
                     resume_ckpt=loaded_ckpt, mesh=mesh)

    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()

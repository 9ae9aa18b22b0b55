"""CLI argument surface, compatible with the reference
(common/arguments.py:10-125) plus TPU-native extensions.

Every reference flag is accepted with the same name and default so existing
command lines keep working (`main.py -k cpn_ft_h36m_dbb -c checkpoint ...`).
Flags for features the reference left dead (postrf, ft2d, ...) are accepted
and validated but may be inert — documented per flag.
"""

import argparse
import os


def build_parser(in_the_wild=False):
    parser = argparse.ArgumentParser(description="Training script")

    # General arguments (reference arguments.py:14-36)
    parser.add_argument("-d", "--dataset", default="h36m", type=str, metavar="NAME",
                        help="target dataset: h36m | synthetic")
    parser.add_argument("-k", "--keypoints", default="cpn_ft_h36m_dbb", type=str,
                        metavar="NAME", help="2D detections to use")
    parser.add_argument("-str", "--subjects-train", default="S1,S5,S6,S7,S8",
                        type=str, metavar="LIST")
    parser.add_argument("-ste", "--subjects-test", default="S9,S11", type=str,
                        metavar="LIST")
    parser.add_argument("-sun", "--subjects-unlabeled", default="", type=str,
                        metavar="LIST")
    parser.add_argument("-a", "--actions", default="*", type=str, metavar="LIST")
    parser.add_argument("-c", "--checkpoint", default="", type=str, metavar="PATH",
                        help="checkpoint directory")
    parser.add_argument("-l", "--log", default="log/default", type=str,
                        metavar="PATH")
    parser.add_argument("-cf", "--checkpoint-frequency", default=20, type=int,
                        metavar="N")
    parser.add_argument("-r", "--resume", default="", type=str, metavar="FILENAME")
    parser.add_argument("--nolog", action="store_true")
    parser.add_argument("--evaluate", default="", type=str, metavar="FILENAME")
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--by-subject", action="store_true")
    parser.add_argument("--export-training-curves", action="store_true")

    # Model arguments (reference arguments.py:39-59)
    stride_default = 1 if in_the_wild else 243
    epochs_default = 120 if in_the_wild else 400
    lr_default = 4e-5 if in_the_wild else 6e-5
    lrd_default = 0.99 if in_the_wild else 0.993
    parser.add_argument("-s", "--stride", default=stride_default, type=int, metavar="N")
    parser.add_argument("-e", "--epochs", default=epochs_default, type=int, metavar="N")
    parser.add_argument("-b", "--batch-size", default=1024, type=int, metavar="N",
                        help="batch size in terms of predicted frames")
    parser.add_argument("-drop", "--dropout", default=0.0, type=float, metavar="P")
    parser.add_argument("-lr", "--learning-rate", default=lr_default, type=float)
    parser.add_argument("-lrd", "--lr-decay", default=lrd_default, type=float)
    parser.add_argument("--coverlr", action="store_true")
    parser.add_argument("-mloss", "--min_loss", default=100000, type=float)
    parser.add_argument("-no-da", "--no-data-augmentation",
                        dest="data_augmentation", action="store_false")
    parser.add_argument("-cs", default=512, type=int, help="model channel width")
    parser.add_argument("-dep", default=8, type=int, help="model depth")
    parser.add_argument("-alpha", default=0.01, type=float)
    parser.add_argument("-beta", default=2, type=float)
    parser.add_argument("--postrf", action="store_true",
                        help="accepted for compatibility (dead in reference)")
    parser.add_argument("--ftpostrf", action="store_true",
                        help="accepted for compatibility (dead in reference)")
    parser.add_argument("-f", "--number-of-frames", default=243, type=int,
                        metavar="N")

    # Experimental (reference arguments.py:64-78)
    parser.add_argument("-gpu", default="0", type=str,
                        help="accepted for compatibility; device selection is JAX-native")
    parser.add_argument("--subset", default=1, type=float, metavar="FRACTION")
    parser.add_argument("--downsample", default=1, type=int, metavar="FACTOR")
    parser.add_argument("--warmup", default=1, type=int, metavar="N")
    parser.add_argument("--no-eval", action="store_true")
    parser.add_argument("--dense", action="store_true")
    parser.add_argument("--disable-optimizations", action="store_true")
    parser.add_argument("--linear-projection", action="store_true")
    parser.add_argument("--no-bone-length", action="store_false",
                        dest="bone_length_term")
    parser.add_argument("--no-proj", action="store_true")
    parser.add_argument("--ft", action="store_true")
    parser.add_argument("--ftpath", default="checkpoint/exp13_ft2d", type=str)
    parser.add_argument("--ftchk", default="epoch_330.pth", type=str)
    parser.add_argument("--no_eval", action="store_true", default=False)

    # Visualization (reference arguments.py:81-93)
    parser.add_argument("--viz-subject", type=str, metavar="STR")
    parser.add_argument("--viz-action", type=str, metavar="STR")
    parser.add_argument("--viz-camera", type=int, default=0, metavar="N")
    parser.add_argument("--viz-video", type=str, metavar="PATH")
    parser.add_argument("--viz-skip", type=int, default=0, metavar="N")
    parser.add_argument("--viz-output", type=str, metavar="PATH")
    parser.add_argument("--viz-export", type=str, metavar="PATH")
    parser.add_argument("--viz-bitrate", type=int, default=3000, metavar="N")
    parser.add_argument("--viz-no-ground-truth", action="store_true")
    parser.add_argument("--viz-limit", type=int, default=-1, metavar="N")
    parser.add_argument("--viz-downsample", type=int, default=1, metavar="N")
    parser.add_argument("--viz-size", type=int, default=5, metavar="N")
    parser.add_argument("--compare", action="store_true", default=False)

    # linear-model flags (reference arguments.py:97-99, dead paths)
    parser.add_argument("-lcs", "--linear_channel_size", type=int, default=1024)
    parser.add_argument("-depth", type=int, default=4)
    parser.add_argument("-ldg", "--lr_decay_gap", type=float, default=10000)

    # Diffusion (reference arguments.py:101-107)
    parser.add_argument("-scale", default=1.0, type=float, help="SNR scale")
    parser.add_argument("-timestep", type=int, default=1000, metavar="N")
    parser.add_argument("-sampling_timesteps", type=int, default=5, metavar="N")
    parser.add_argument("-num_proposals", type=int, default=300, metavar="N")
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--p2", action="store_true", default=False)
    parser.add_argument("--p2-device", action="store_true", default=False,
                        help="compute Protocol-2 (Procrustes) inside the "
                             "jitted eval step via batched jnp SVD instead "
                             "of host numpy (implies --p2). Host numpy stays "
                             "the default for bit-parity with the "
                             "reference's LAPACK path (~1e-4 mm differences "
                             "on ill-conditioned poses)")

    # ------------------------- TPU-native extensions -------------------------
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="model compute dtype (bfloat16 = fast path)")
    parser.add_argument("--attention", default="auto",
                        choices=["auto", "xla", "pallas"],
                        help="attention kernel: pallas = fused VMEM kernel "
                             "with custom-VJP backward (TPU only). 'auto' "
                             "picks pallas on TPU for eval models, and for "
                             "training too when --dtype bfloat16 (the "
                             "qualified ~4.3x fast path; PERFORMANCE.md). "
                             "fp32 training stays on the xla parity path "
                             "unless 'pallas' is passed explicitly.")
    parser.add_argument("--fuse-level", type=int, default=4,
                        choices=[0, 1, 2, 3, 4, 5],
                        help="Pallas-path kernel fusion ladder (tuning knob; "
                             "each level measured faster in-graph on v5e — "
                             "lower levels are the fallback for other TPU "
                             "generations): 0 = fused attention only, "
                             "2 = +attention/MLP stage kernels, 3 = "
                             "+transpose-free flow, 4 = +LN1/qkv folded in "
                             "(two kernels per block), 5 = depth-resident "
                             "megakernel (whole trunk in one Pallas call, "
                             "stream resident in VMEM; eval/sampling only — "
                             "training falls back to 4). Ignored with "
                             "--attention xla.")
    parser.add_argument("--ddim-reuse", type=int, default=0, metavar="N",
                        help="DDIM feature reuse (FRDiff-style): refresh the "
                             "deep transformer blocks every N sampling steps "
                             "(and ALWAYS on the final step) and reuse their "
                             "cached contribution in between (0/1 = off, "
                             "exact reference semantics). ACCURACY DIAL, "
                             "not free speed: on a converged model every "
                             "interval >=2 costs real mm (r5 tables in "
                             "PERFORMANCE.md; the earlier 'neutral at "
                             "2.14x' was an unconverged-checkpoint "
                             "artifact, retracted). Eval only.")
    parser.add_argument("--ddim-reuse-tap", type=int, default=2, metavar="D",
                        help="with --ddim-reuse: number of shallow block "
                             "pairs computed fresh on reuse steps (1..dep)")
    parser.add_argument("--ddim-reuse-adaptive", type=float, default=0.0,
                        metavar="TAU",
                        help="with --ddim-reuse: ALSO refresh whenever the "
                             "noisy pose drifts more than TAU (relative L2) "
                             "since the last refresh — the interval becomes "
                             "the maximum stretch (0 = fixed schedule). "
                             "Accuracy safety valve with NO measured speed "
                             "case: at every K tried (5/10/20) step-to-step "
                             "drift exceeds useful thresholds, so it "
                             "degenerates to refresh-every-step at ~1.0x "
                             "(PERFORMANCE.md r4)")
    parser.add_argument("--jax-cache", default=os.environ.get(
                            "JAX_COMPILATION_CACHE_DIR",
                            os.path.expanduser("~/.cache/d3dp_tpu/jax")),
                        metavar="DIR",
                        help="persistent XLA compilation cache directory "
                             "(warm restarts skip recompiles, incl. through "
                             "remote TPU backends); empty string disables")
    parser.add_argument("--platform", default="",
                        help="force a JAX platform (e.g. cpu); empty = default")
    parser.add_argument("--num-virtual-devices", type=int, default=0,
                        help="with --platform cpu: create N virtual devices")
    parser.add_argument("--ckpt-format", default="pickle",
                        choices=["pickle", "orbax"],
                        help="checkpoint backend: 'pickle' = one atomic "
                             "self-contained file (default); 'orbax' = "
                             "directory format, sharding-aware, with ASYNC "
                             "periodic saves (serialization overlaps "
                             "training; the run drains pending saves before "
                             "exit). Same logical payload either way "
                             "({epoch, lr, random_state, optimizer, model}); "
                             "--resume/--evaluate accept both")
    parser.add_argument("--input-pipeline", default="thread",
                        choices=["thread", "grain"],
                        help="training input pipeline: 'thread' = background "
                             "prefetcher (+C++ assembler), 'grain' = "
                             "grain.MapDataset multi-threaded read-ahead "
                             "(byte-identical batches either way)")
    parser.add_argument("--multihost", action="store_true",
                        help="join the JAX process group before backend init "
                             "(pod auto-detection; use the coordinator flags "
                             "for manual bring-up)")
    parser.add_argument("--coordinator-address", default="", metavar="HOST:PORT",
                        help="multi-host coordinator (implies --multihost)")
    parser.add_argument("--num-hosts", type=int, default=0, metavar="N")
    parser.add_argument("--host-id", type=int, default=-1, metavar="I")
    parser.add_argument("--dp", type=int, default=0,
                        help="data-parallel mesh size (0 = all devices)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel mesh size")
    parser.add_argument("--seed", type=int, default=1,
                        help="global seed (reference fixes 1, main.py:67-71)")
    parser.add_argument("--eval-batch-size", type=int, default=0, metavar="N",
                        help="eval windows per jitted step (0 = use -b, the "
                             "reference behaviour; set small when -b is a "
                             "large training batch)")
    parser.add_argument("--profile", default="", metavar="DIR",
                        help="capture a jax.profiler trace of the first "
                             "training steps into DIR (TensorBoard/Perfetto)")
    parser.add_argument("--synthetic-frames", type=int, default=1200,
                        help="--dataset synthetic: total frames per split")

    parser.set_defaults(bone_length_term=True)
    parser.set_defaults(data_augmentation=True)
    parser.set_defaults(test_time_augmentation=True)
    return parser


def parse_args(argv=None, in_the_wild=False):
    parser = build_parser(in_the_wild=in_the_wild)
    args = parser.parse_args(argv)
    # reference's mutual exclusions (arguments.py:117-123)
    if args.resume and args.evaluate:
        parser.error("--resume and --evaluate cannot be set at the same time")
    if args.export_training_curves and args.no_eval:
        parser.error("--export-training-curves and --no-eval cannot be set "
                     "at the same time")
    if (args.num_hosts or args.host_id >= 0) and not args.coordinator_address:
        parser.error("--num-hosts/--host-id require --coordinator-address "
                     "(without it, jax.distributed auto-detects the topology "
                     "and would silently ignore them)")
    if args.p2_device:
        args.p2 = True  # --p2-device implies Protocol-2 reporting
    return args


def apply_platform_args(args):
    """Apply --platform/--num-virtual-devices/--jax-cache/--multihost before
    any jax backend use."""
    import jax

    if args.multihost or args.coordinator_address:
        from d3dp_tpu.parallel.multihost import initialize_multihost

        idx, count = initialize_multihost(
            coordinator_address=args.coordinator_address or None,
            num_processes=args.num_hosts or None,
            process_id=args.host_id if args.host_id >= 0 else None)
        print(f"multihost: process {idx}/{count}")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.num_virtual_devices and args.platform == "cpu":
            jax.config.update("jax_num_cpu_devices", args.num_virtual_devices)
    if args.jax_cache:
        from d3dp_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(args.jax_cache)

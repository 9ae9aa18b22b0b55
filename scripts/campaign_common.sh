# Shared helpers for the serialized TPU campaign scripts. Source from a
# campaign script AFTER cd-ing to the repo root:
#
#   source "$(dirname "$0")/campaign_common.sh"
#
# Provides:
#   probe         — trivial device op; exits 0 iff it completes in <20 s
#                   (the remote tunnel's health signal, CLAUDE.md)
#   wait_healthy  — block (re-probing every 7 min) until the tunnel is
#                   healthy; campaigns call this before each cell GROUP,
#                   not just once — the tunnel degrades over hours
#   run NAME CMD… — run one cell: tee full output to /tmp/${CELL_PREFIX}_
#                   cell_NAME.out, echo its last line + exit code to the
#                   campaign log (timeout → rc=124)
#
# Campaign scripts set CELL_PREFIX (e.g. "r4c") before sourcing; it
# defaults to "cell". Tuning values (probe threshold, degraded sleep) live
# ONLY here — the r3/r4 scripts had five diverging copies.

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"
CELL_PREFIX="${CELL_PREFIX:-cell}"

probe() {
  timeout 120 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); s=float(jnp.sum(jnp.ones((1024,1024))))
el=time.time()-t0
print(f'probe {el:.2f}s', flush=True); raise SystemExit(0 if el < 20 else 1)"
}

wait_healthy() {
  until probe; do echo "DEGRADED $(date) — sleeping"; sleep 420; done
  echo "HEALTHY $(date)"
}

run() {
  name="$1"; shift
  echo "== $name: $* =="
  env "$@" > "/tmp/${CELL_PREFIX}_cell_${name}.out" 2>&1
  rc=$?
  tail -1 "/tmp/${CELL_PREFIX}_cell_${name}.out"
  echo "rc=$rc ($name)"
}

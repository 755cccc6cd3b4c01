#!/bin/bash
# Round-5 on-chip evidence orchestrator (VERDICT r4 #1/#2).
#
# The axon TPU tunnel flaps; this script probes health before each
# step, retries on wedged windows, and captures every artifact the
# moment it exists:
#   docs/BENCH_r05_tpu.log        bench.py on the real chip
#   docs/SOAK_r05.log             scripts/soak.py (4541 frames)
#   docs/DEVICE_PROFILE_r05.md    scripts/device_profile.py
#
# Usage: bash scripts/evidence_r05.sh [bench|soak|profile|all]
set -u
cd "$(dirname "$0")/.."

probe() {
    # fresh-process probe: a wedged backend wedges per-process
    timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
EOF
}

wait_healthy() {
    local n=0
    until probe; do
        n=$((n + 1))
        echo "[evidence] tunnel wedged (probe $n failed), sleeping 60s" >&2
        [ "$n" -ge 30 ] && return 1
        sleep 60
    done
    return 0
}

run_step() {  # run_step <name> <outfile> <cmd...>
    local name="$1" out="$2"; shift 2
    local try
    for try in 1 2 3; do
        wait_healthy || { echo "[evidence] $name: gave up on tunnel" >&2; return 1; }
        echo "[evidence] $name attempt $try -> $out" >&2
        if timeout 3600 "$@" > "$out.tmp" 2>&1; then
            mv "$out.tmp" "$out"
            echo "[evidence] $name OK" >&2
            return 0
        fi
        mv "$out.tmp" "$out.failed_$try" 2>/dev/null
        echo "[evidence] $name attempt $try FAILED (log kept)" >&2
    done
    return 1
}

mkdir -p docs
what="${1:-all}"
rc=0
case "$what" in
    bench|all)   run_step bench docs/BENCH_r05_tpu.log \
                     python bench.py || rc=1 ;;&
    soak|all)    run_step soak docs/SOAK_r05.log \
                     python scripts/soak.py || rc=1 ;;&
    profile|all) run_step profile docs/DEVICE_PROFILE_r05.md \
                     python scripts/device_profile.py || rc=1 ;;
esac
exit $rc

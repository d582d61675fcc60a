"""CLI entry point.

The reference is driven as
``julia -O3 -e "using ElPhDynamics; simulate(ARGS)" -- input.toml [run_id]``
(ElPhDynamics.jl:68-69); the equivalent here is

    python -m elphdynamics_tpu input.toml [run_id] [--chains N] [--x64]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser(prog="elphdynamics_tpu")
    ap.add_argument("input", help="TOML input file (reference-compatible schema)")
    ap.add_argument("run_id", nargs="?", type=int, default=None,
                    help="datafolder suffix id (auto-incremented if omitted)")
    ap.add_argument("--chains", type=int, default=1,
                    help="independent Markov chains batched on device "
                         "(0 = auto: the measured throughput-peak batch "
                         "for the lattice size, BASELINE.md)")
    ap.add_argument("--devices", type=int, default=1,
                    help="devices to shard the chains over (0 = all local "
                         "devices); chains must be a multiple of devices")
    ap.add_argument("--site-devices", type=int, default=1,
                    help="shard ONE chain's spatial lattice over this many "
                         "devices (Holstein HMC; for lattices that outgrow "
                         "a single chip; 0 = all local devices)")
    ap.add_argument("--x64", action="store_true",
                    help="enable float64 (CPU parity mode; TPU runs f32)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture an XLA profiler trace (TensorBoard format) "
                         "of the whole run into DIR")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed (one process per host; "
                         "cluster autodetected from the environment on TPU "
                         "pods). Every process runs this same command; host "
                         "IO happens on process 0 only. Combine with "
                         "--devices 0 to span all global devices.")
    args = ap.parse_args()

    import os

    import jax

    # Honor an explicit virtual-device request: some hosted runtimes
    # force-register their accelerator platform ahead of JAX_PLATFORMS, so
    # a CLI run asked to use N virtual CPU devices
    # (XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu)
    # would silently land on the single real chip instead.
    if ("xla_force_host_platform_device_count"
            in os.environ.get("XLA_FLAGS", "")
            and os.environ.get("JAX_PLATFORMS", "") == "cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    if args.x64:
        jax.config.update("jax_enable_x64", True)

    from elphdynamics_tpu.simulation import simulate

    if args.profile:
        with jax.profiler.trace(args.profile):
            stats = simulate(args.input, run_id=args.run_id,
                             n_chains=args.chains, n_devices=args.devices,
                             site_devices=args.site_devices,
                             multihost=args.multihost)
    else:
        stats = simulate(args.input, run_id=args.run_id,
                         n_chains=args.chains, n_devices=args.devices,
                         site_devices=args.site_devices,
                         multihost=args.multihost)
    print(stats)


if __name__ == "__main__":
    main()

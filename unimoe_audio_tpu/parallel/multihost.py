"""Multi-host (DCN) initialization plumbing shared by the serve/train CLIs.

The TPU-native replacement for the reference's deepspeed launcher
master_addr/master_port flags (reference: script/training.sh:34-37 and the
`deepspeed --master_port 9042` EP-inference launch,
UniMoEV2-Preview/Readme.md:58): one `jax.distributed.initialize()` call,
either auto-configured from the TPU pod metadata (bare --multihost) or
explicit (--coordinator-address/--num-processes/--process-id for GKE /
non-TPU-metadata environments).
"""

from __future__ import annotations

import argparse
from typing import Optional


def add_multihost_args(parser: argparse.ArgumentParser) -> None:
    g = parser.add_argument_group("multi-host (DCN)")
    g.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for pods "
                        "(auto coordinator from TPU metadata)")
    g.add_argument("--coordinator-address", default=None, metavar="HOST:PORT",
                   help="explicit coordinator (implies --multihost)")
    g.add_argument("--num-processes", type=int, default=None)
    g.add_argument("--process-id", type=int, default=None)


def maybe_initialize_multihost(args, *, initialize=None) -> bool:
    """Run jax.distributed.initialize() per the parsed args.

    Returns True when initialization happened.  `initialize` is injectable
    for tests (defaults to jax.distributed.initialize).
    """
    if not (args.multihost or args.coordinator_address):
        return False
    if initialize is None:
        import jax

        initialize = jax.distributed.initialize
    kwargs = {}
    if args.coordinator_address:
        kwargs["coordinator_address"] = args.coordinator_address
    if args.num_processes is not None:
        kwargs["num_processes"] = args.num_processes
    if args.process_id is not None:
        kwargs["process_id"] = args.process_id
    initialize(**kwargs)
    return True

"""Full consensus simulation: VRF-elected validators produce blocks
automatically (claims + work pool + draft + broadcast) and peers sync
(model: reference src/node/test/mod.rs automatic block production)."""

import asyncio

import pytest

from bazuka_tpu.config.blockchain import get_test_blockchain_config
from bazuka_tpu.node import get_simulator_options
from bazuka_tpu.node.simulation import Simulation, catch_change


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def test_automatic_block_production_with_election():
    async def body():
        conf = get_test_blockchain_config()
        conf.check_validator = True  # real VRF election
        sim = Simulation()
        opts = get_simulator_options()
        opts.automatic_block_generation = True
        # the three genesis validators run nodes; their VRF keys are staked
        for i, seed in enumerate((b"VALIDATOR", b"VALIDATOR2", b"VALIDATOR3")):
            sim.add_node(3060 + i, conf,
                         bootstrap=[3060 + j for j in range(3) if j != i],
                         seed=seed, opts=opts)
        # node wallets must be the VALIDATOR wallets themselves: the
        # simulator derives validator wallet from `seed` directly
        await sim.start()
        try:
            heights = lambda: max(
                n.context.blockchain.get_height() for n in sim.nodes.values()
            )
            await catch_change(heights, timeout=30.0)
            produced = heights()
            assert produced >= 2
            # peers converge
            await catch_change(
                lambda: min(
                    n.context.blockchain.get_height() for n in sim.nodes.values()
                ),
                timeout=30.0,
            )
        finally:
            await sim.stop()
        tips = {
            n.context.blockchain.get_height() for n in sim.nodes.values()
        }
        assert max(tips) >= 2

    run(body())

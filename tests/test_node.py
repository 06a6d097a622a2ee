"""Multi-node simulation tests (model: reference src/node/test/):
peer discovery, block sync, clock sync, fault injection, API surface."""

import asyncio

import pytest

from bazuka_tpu.client import NodeRequest, to_hex
from bazuka_tpu.config.blockchain import get_test_blockchain_config
from bazuka_tpu.core import GeneralTransaction
from bazuka_tpu.core.transaction import Money
from bazuka_tpu.node.simulation import Rule, Simulation, catch_change
from bazuka_tpu.wallet.tx_builder import TxBuilder


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def make_sim(n=2, rules=()):
    sim = Simulation()
    conf = get_test_blockchain_config()
    for i in range(n):
        sim.add_node(3030 + i, conf, bootstrap=[3030 + j for j in range(n) if j != i])
    sim.rules.extend(rules)
    return sim


def test_peers_discover_each_other():
    async def body():
        sim = make_sim(3)
        await sim.start()
        try:
            await catch_change(
                lambda: all(
                    node.context.peer_manager.node_count() >= 2
                    for node in sim.nodes.values()
                ),
                timeout=15.0,
            )
        finally:
            await sim.stop()
        for node in sim.nodes.values():
            assert node.context.peer_manager.node_count() >= 2

    run(body())


def test_blocks_sync_between_nodes():
    async def body():
        sim = make_sim(2)
        n0 = sim.nodes[3030]
        n1 = sim.nodes[3031]
        # node 0 produces a block before the network starts
        val = TxBuilder(b"VALIDATOR")
        blk = n0.context.blockchain.draft_block(10, [], val, check=True)
        n0.context.blockchain.apply_block(blk)
        assert n0.context.blockchain.get_height() == 2
        assert n1.context.blockchain.get_height() == 1
        await sim.start()
        try:
            await catch_change(
                lambda: n1.context.blockchain.get_height(), timeout=15.0
            )
        finally:
            await sim.stop()
        assert n1.context.blockchain.get_height() == 2
        assert (
            n1.context.blockchain.get_tip().hash()
            == n0.context.blockchain.get_tip().hash()
        )

    run(body())


def test_drop_rule_blocks_sync():
    async def body():
        rules = [Rule("drop", path="/bincode/headers")]
        sim = make_sim(2, rules)
        n0, n1 = sim.nodes[3030], sim.nodes[3031]
        val = TxBuilder(b"VALIDATOR")
        blk = n0.context.blockchain.draft_block(10, [], val, check=True)
        n0.context.blockchain.apply_block(blk)
        await sim.start()
        await asyncio.sleep(2.0)
        await sim.stop()
        # headers endpoint dropped -> no sync
        assert n1.context.blockchain.get_height() == 1

    run(body())


def test_mempool_propagates():
    async def body():
        sim = make_sim(2)
        n0, n1 = sim.nodes[3030], sim.nodes[3031]
        abc = TxBuilder(b"ABC")
        bob = TxBuilder(b"BOB")
        td = abc.create_transaction("", bob.get_address(), Money.ziesha(10),
                                    Money.ziesha(1), 1)
        n0.context.mempool.min_balance_per_tx = 1
        n1.context.mempool.min_balance_per_tx = 1
        n0.context.mempool_add_tx(True, GeneralTransaction(td))
        assert len(n0.context.mempool) == 1
        await sim.start()
        try:
            await catch_change(lambda: len(n1.context.mempool), timeout=15.0)
        finally:
            await sim.stop()
        assert len(n1.context.mempool) == 1

    run(body())


def test_api_surface():
    async def body():
        sim = make_sim(1)
        node = sim.nodes[3030]
        # direct request submission (local)
        await sim.start()
        try:
            sender = sim.sender("127.0.0.1")
            from bazuka_tpu.client import PeerAddress

            peer = PeerAddress("10.0.0.1", 3030)
            stats = await sender.json_get(peer, "/stats")
            assert stats["height"] == 1
            assert stats["network"] == "sim"
            abc = TxBuilder(b"ABC")
            bal = await sender.json_get(
                peer, "/balance",
                {"address": str(abc.get_address()), "token_id": "Ziesha"},
            )
            assert bal["balance"] == 10000
            acct = await sender.json_get(
                peer, "/account", {"address": str(abc.get_address())}
            )
            assert acct["nonce"] == 0
            expl = await sender.json_get(peer, "/explorer/blocks", {"since": 0, "count": 5})
            assert len(expl["blocks"]) == 1
            stakers = await sender.json_get(peer, "/explorer/stakers")
            assert len(stakers["stakers"]) == 3
            dbg = await sender.json_get(peer, "/debug")
            assert dbg["height"] == 1
            missing = await sender.request(
                peer, NodeRequest("GET", "/nonexistent")
            )
            assert missing.status == 404
        finally:
            await sim.stop()

    run(body())


def test_shutdown_forbidden_remotely():
    async def body():
        sim = make_sim(1)
        await sim.start()
        try:
            sender = sim.sender("9.9.9.9")  # non-local caller
            from bazuka_tpu.client import PeerAddress

            resp = await sender.request(
                PeerAddress("10.0.0.1", 3030), NodeRequest("POST", "/shutdown")
            )
            assert resp.status == 403
            assert not sim.nodes[3030].context.shutdown
        finally:
            await sim.stop()

    run(body())


def test_transact_endpoint():
    async def body():
        sim = make_sim(1)
        node = sim.nodes[3030]
        node.context.mempool.min_balance_per_tx = 1
        await sim.start()
        try:
            from bazuka_tpu.client import PeerAddress

            sender = sim.sender("127.0.0.1")
            abc = TxBuilder(b"ABC")
            bob = TxBuilder(b"BOB")
            td = abc.create_transaction("", bob.get_address(), Money.ziesha(5),
                                        Money.ziesha(1), 1)
            await sender.json_post(
                PeerAddress("10.0.0.1", 3030), "/bincode/transact",
                {"tx": to_hex(GeneralTransaction(td))},
            )
            assert len(node.context.mempool) == 1
        finally:
            await sim.stop()

    run(body())


def test_delay_rule_slows_but_allows_sync():
    """Delay(0.3s) on every request: sync still completes, just later
    (reference simulation.rs Action::Delay)."""
    async def body():
        rules = [Rule("delay", delay=0.3)]
        sim = make_sim(2, rules)
        n0, n1 = sim.nodes[3030], sim.nodes[3031]
        val = TxBuilder(b"VALIDATOR")
        blk = n0.context.blockchain.draft_block(10, [], val, check=True)
        n0.context.blockchain.apply_block(blk)
        await sim.start()
        try:
            await catch_change(
                lambda: n1.context.blockchain.get_height(), timeout=20.0
            )
        finally:
            await sim.stop()
        assert n1.context.blockchain.get_height() == 2

    run(body())


def test_redirect_rule_syncs_from_other_node():
    """Redirect node 1's requests for node 0 to node 2: node 1 ends up on
    node 2's (longer) chain even though it only dialed node 0
    (reference simulation.rs Action::Redirect)."""
    async def body():
        sim = Simulation()
        conf = get_test_blockchain_config()
        # node 1 only knows node 0; all traffic to 3030 redirects to 3032
        sim.add_node(3030, conf, bootstrap=[])
        sim.add_node(3031, conf, bootstrap=[3030])
        sim.add_node(3032, conf, bootstrap=[])
        sim.rules.append(Rule("redirect", port=3030, redirect_to=3032))
        n1, n2 = sim.nodes[3031], sim.nodes[3032]
        val = TxBuilder(b"VALIDATOR")
        blk = n2.context.blockchain.draft_block(10, [], val, check=True)
        n2.context.blockchain.apply_block(blk)
        await sim.start()
        try:
            await catch_change(
                lambda: n1.context.blockchain.get_height(), timeout=20.0
            )
        finally:
            await sim.stop()
        assert n1.context.blockchain.get_height() == 2
        assert (
            n1.context.blockchain.get_tip().hash()
            == n2.context.blockchain.get_tip().hash()
        )

    run(body())


def test_clock_syncs_to_median_under_skew():
    """A node whose clock is skewed adopts the median peer offset, even
    with delayed traffic (reference src/node/test/mod.rs clock-sync)."""
    async def body():
        rules = [Rule("delay", delay=0.1, path="/bincode/peers")]
        sim = make_sim(3, rules)
        skewed = sim.nodes[3030]
        # the skewed node's wall clock runs 100 s behind the other two
        skewed.context.clock_skew = -100
        await sim.start()
        try:
            # it must learn a ~+100 correction so its network timestamp
            # matches the majority's raw clock
            await catch_change(
                lambda: abs(skewed.context.timestamp_offset - 100) <= 3,
                timeout=20.0,
            )
        finally:
            await sim.stop()
        assert abs(skewed.context.timestamp_offset - 100) <= 3

    run(body())

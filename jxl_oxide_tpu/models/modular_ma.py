"""Meta-adaptive (MA) tree parsing and per-(channel, stream) flattening.

Behavioral parity: jxl-modular/src/ma.rs — 6-context tree decode stream,
node/depth limits, leaf = (cluster, predictor, offset, multiplier), and the
static pruning of channel/stream/prev-channel decision nodes. The reference's
fused-decision / table node compilation is a CPU micro-optimization; the
Python tree walks plain nodes, and the C++ host runtime re-introduces fusion.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..coding.entropy import Decoder
from ..io.bitstream import Bitstream, unpack_signed
from ..utils.errors import JxlBitstreamError, JxlValidationError

__all__ = ["MaConfig", "FlatLeaf", "FlatTree"]

I32_MIN = -(1 << 31)
I32_MAX = (1 << 31) - 1


@dataclass(frozen=True)
class _Node:
    # Decision node: property >= 0, value, left, right (indices).
    # Leaf: property == -1; cluster/predictor/offset/multiplier set.
    property: int
    value: int
    left: int
    right: int
    cluster: int
    predictor: int
    offset: int
    multiplier: int


@dataclass(frozen=True)
class FlatLeaf:
    cluster: int
    predictor: int
    offset: int
    multiplier: int


class FlatTree:
    """Tree specialized for one (channel, stream, prev_channels) triple."""

    __slots__ = ("nodes", "need_self_correcting", "max_prev_channel_depth",
                 "_single", "_native_arr")

    def __init__(self, nodes):
        # nodes: list of either FlatLeaf or (property, value, left, right)
        self.nodes = nodes
        need_sc = False
        max_prev = 0
        for nd in nodes:
            if isinstance(nd, FlatLeaf):
                if nd.predictor == 6:
                    need_sc = True
            else:
                prop = nd[0]
                if prop == 15:
                    need_sc = True
                if prop >= 16:
                    max_prev = max(max_prev, (prop - 16) // 4 + 1)
        self.need_self_correcting = need_sc
        self.max_prev_channel_depth = max_prev
        self._single = nodes[0] if isinstance(nodes[0], FlatLeaf) else None

    def single_node(self) -> FlatLeaf | None:
        return self._single

    def get_leaf(self, state) -> FlatLeaf:
        nodes = self.nodes
        nd = nodes[0]
        while not isinstance(nd, FlatLeaf):
            prop, value, left, right = nd
            v = state.get_property(prop)
            nd = nodes[left] if v > value else nodes[right]
        return nd

    def simple_table(self):
        """If the root decides on one property and all children are leaves
        sharing (predictor, offset, multiplier), return
        (prop, value_base, predictor, offset, multiplier, cluster_table).
        Simplified analog of ma.rs simple_table (used for the gradient-table
        fast path when prop == 9)."""
        root = self.nodes[0]
        if isinstance(root, FlatLeaf):
            return None
        prop = root[0]
        # Collect thresholds along a chain that all test the same property.
        # Gather leaves over value ranges via DFS with range tracking.
        thresholds = set()
        stack = [0]
        leaves = []
        while stack:
            i = stack.pop()
            nd = self.nodes[i]
            if isinstance(nd, FlatLeaf):
                leaves.append(nd)
                continue
            if nd[0] != prop:
                return None
            thresholds.add(nd[1])
            stack.append(nd[2])
            stack.append(nd[3])
        if not thresholds or len(thresholds) > 1024:
            return None
        lo, hi = min(thresholds), max(thresholds)
        if hi - lo > 1024 - 2:
            return None
        base = lo
        size = hi - lo + 2
        shared = (leaves[0].predictor, leaves[0].offset, leaves[0].multiplier)
        for leaf in leaves:
            if (leaf.predictor, leaf.offset, leaf.multiplier) != shared:
                return None
        table = []
        for idx in range(size):
            # Entry idx covers property value v = base + idx (clamped at the
            # ends): idx 0 is v <= base, idx size-1 is v > hi.
            v_probe = base + idx
            nd = self.nodes[0]
            while not isinstance(nd, FlatLeaf):
                _, value, left, right = nd
                nd = self.nodes[left] if v_probe > value else self.nodes[right]
            table.append(nd.cluster)
        return (prop, base, shared[0], shared[1], shared[2], table)


class MaConfig:
    """Parsed MA tree + the distribution set used to decode samples."""

    def __init__(self, bs: Bitstream, node_limit: int, depth_limit: int = 2048):
        tree_decoder = Decoder(bs, 6)
        # Infinite-tree guard (ma.rs is_infinite_tree_dist): if distribution 1
        # always emits a nonzero token, every node is a decision node.
        cluster1 = tree_decoder.clusters[1]
        tok = tree_decoder.single_token(cluster1)
        if tok is not None and tok != 0:
            raise JxlBitstreamError("infinite MA tree")

        tree_decoder.begin(bs)
        nodes_raw: list[tuple] = []  # (kind, ...)
        ctx = 0
        nodes_left = 1
        while nodes_left > 0:
            if len(nodes_raw) >= (1 << 26) or len(nodes_raw) > node_limit:
                raise JxlValidationError("MA tree node limit exceeded")
            nodes_left -= 1
            prop_plus1 = tree_decoder.read_varint(bs, 1)
            if prop_plus1 > 0:
                value = unpack_signed(tree_decoder.read_varint(bs, 0))
                nodes_raw.append(("d", prop_plus1 - 1, value))
                nodes_left += 2
            else:
                predictor = tree_decoder.read_varint(bs, 2)
                if predictor > 13:
                    raise JxlBitstreamError("invalid predictor in MA tree")
                offset = unpack_signed(tree_decoder.read_varint(bs, 3))
                mul_log = tree_decoder.read_varint(bs, 4)
                if mul_log > 30:
                    raise JxlBitstreamError("invalid multiplier log")
                mul_bits = tree_decoder.read_varint(bs, 5)
                if mul_bits > (1 << (31 - mul_log)) - 2:
                    raise JxlBitstreamError("invalid multiplier bits")
                multiplier = (mul_bits + 1) << mul_log
                nodes_raw.append(("l", ctx, predictor, offset, multiplier))
                ctx += 1
        tree_decoder.finalize()
        self.num_tree_nodes = len(nodes_raw)

        self.decoder_template = Decoder(bs, ctx)
        cluster_map = self.decoder_template.clusters

        # Build the tree in preorder-with-two-children layout. nodes_raw is in
        # BFS order of "nodes_left" stack... actually the reference builds it
        # by reading nodes in the order they appear and linking via a reverse
        # fold; we reconstruct children indices with a queue: each decision
        # node's children are the next unclaimed nodes in order.
        n = len(nodes_raw)
        nodes: list[_Node] = [None] * n  # type: ignore[list-item]
        # The bitstream order is: node, then all remaining nodes of the
        # "pending" queue breadth-wise: reading appends 2 pending children per
        # decision node. Reconstruct via explicit queue of parent slots.
        child_ptr = 1
        queue = [0]
        depths = [1] * n
        for i in range(n):
            raw = nodes_raw[i]
            if raw[0] == "d":
                left = child_ptr
                right = child_ptr + 1
                child_ptr += 2
                nodes[i] = _Node(raw[1], raw[2], left, right, 0, 0, 0, 0)
                depths[left] = depths[i] + 1
                depths[right] = depths[i] + 1
                if depths[i] + 1 > depth_limit:
                    raise JxlValidationError("MA tree too deep")
            else:
                _, c, predictor, offset, multiplier = raw
                nodes[i] = _Node(
                    -1, 0, 0, 0, cluster_map[c], predictor, offset, multiplier
                )
        self.nodes = nodes
        self.tree_depth = max(depths) if n else 0
        self._flat_cache: dict[tuple[int, int, int], FlatTree] = {}
        import threading

        self._flat_lock = threading.Lock()

    def make_decoder(self) -> Decoder:
        """Fresh per-stream decoder sharing the parsed distributions."""
        import copy

        from ..coding.entropy import _Lz77State

        d = copy.copy(self.decoder_template)
        d.state = 0
        d._initial = True
        if d.lz77 is not None:
            d.lz77 = _Lz77State(d.lz77.len_config)
        return d

    # -- flattening ---------------------------------------------------------

    def _resolve_static(self, idx: int, channel: int, stream: int, prev: int) -> int:
        """Skip decision nodes decidable statically (ma.rs next_decision_node):
        property 0 (channel), 1 (stream), and prev-channel props referencing
        channels beyond `prev` (those read as 0 -> compare 0 > value)."""
        while True:
            nd = self.nodes[idx]
            if nd.property == -1:
                return idx
            if nd.property == 0:
                idx = nd.left if channel > nd.value else nd.right
            elif nd.property == 1:
                idx = nd.left if stream > nd.value else nd.right
            elif nd.property >= 16 and (nd.property - 16) // 4 >= prev:
                idx = nd.left if nd.value < 0 else nd.right
            else:
                return idx

    def make_flat_tree(self, channel: int, stream: int, prev_channels: int) -> FlatTree:
        key = (channel, stream, prev_channels)
        cached = self._flat_cache.get(key)
        if cached is not None:
            return cached
        lock = getattr(self, "_flat_lock", None)
        if lock is not None:
            with lock:
                return self._make_flat_tree_locked(key, channel, stream, prev_channels)
        return self._make_flat_tree_locked(key, channel, stream, prev_channels)

    def _make_flat_tree_locked(self, key, channel, stream, prev_channels):
        cached = self._flat_cache.get(key)
        if cached is not None:
            return cached
        out = []
        mapping: dict[int, int] = {}
        order: list[int] = []

        def visit(idx: int) -> int:
            idx = self._resolve_static(idx, channel, stream, prev_channels)
            if idx in mapping:
                return mapping[idx]
            slot = len(order)
            mapping[idx] = slot
            order.append(idx)
            out.append(None)
            return slot

        visit(0)
        i = 0
        while i < len(order):
            idx = order[i]
            nd = self.nodes[idx]
            if nd.property == -1:
                out[i] = FlatLeaf(nd.cluster, nd.predictor, nd.offset, nd.multiplier)
            else:
                li = visit(nd.left)
                ri = visit(nd.right)
                out[i] = (nd.property, nd.value, li, ri)
            i += 1
        tree = FlatTree(out)
        self._flat_cache[key] = tree
        return tree

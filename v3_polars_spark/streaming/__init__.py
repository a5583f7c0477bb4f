from .ingest_stream import (
    run_available_now,
    stream_dedup_exact,
    stream_table,
    streaming_resample,
    streaming_sessionize,
)
from .quality_stream import (
    read_bin_counts,
    read_kll_quantiles,
    streaming_bin_counts,
    streaming_kll_state,
)
from .ann_stream import (
    compact_ivf_index,
    current_ivf_root,
    read_ivf_index,
    retrain_ivf_index,
    seed_ivf_index,
    set_current_ivf_root,
    streaming_ivf_assign,
)
from .dedup_stream import (
    compact_corpus_state,
    read_corpus,
    seed_corpus,
    streaming_corpus_dedup,
)
from .pack_stream import (
    compact_packed_shards,
    read_pack_carries,
    read_pack_carry,
    read_packed_shards,
    streaming_token_shards,
)
from .stateful import streaming_liquidity_deltas
from .upsert_stream import read_snapshot, streaming_snapshot_upsert

__all__ = [
    "read_kll_quantiles",
    "streaming_kll_state",
    "read_bin_counts",
    "streaming_bin_counts",
    "streaming_snapshot_upsert",
    "read_snapshot",
    "streaming_corpus_dedup",
    "compact_corpus_state",
    "seed_corpus",
    "read_corpus",
    "streaming_ivf_assign",
    "seed_ivf_index",
    "read_ivf_index",
    "compact_ivf_index",
    "retrain_ivf_index",
    "set_current_ivf_root",
    "current_ivf_root",
    "run_available_now",
    "stream_dedup_exact",
    "stream_table",
    "streaming_resample",
    "streaming_sessionize",
    "streaming_liquidity_deltas",
    "streaming_token_shards",
    "read_packed_shards",
    "read_pack_carry",
    "read_pack_carries",
    "compact_packed_shards",
]

from miner_tpu.data.tokenization import HashTokenizer, Tokenizer, load_tokenizer
from miner_tpu.data.news_store import NewsStore
from miner_tpu.data.behaviors import BehaviorsLog
from miner_tpu.data.samplers import (
    EvalSampler,
    OfflineSampler,
    OnlineSampler,
    PretrainSampler,
)
from miner_tpu.data.batcher import Batcher

__all__ = [
    "HashTokenizer",
    "Tokenizer",
    "load_tokenizer",
    "NewsStore",
    "BehaviorsLog",
    "OfflineSampler",
    "OnlineSampler",
    "PretrainSampler",
    "EvalSampler",
    "Batcher",
]

from miner_tpu.models.plm import PLMConfig, TransformerPLM
from miner_tpu.models.news_encoder import NewsEncoder, NewsEncoderMoe, MoEAdaptor
from miner_tpu.models.poly_attention import PolyAttention, TargetAwareAttention
from miner_tpu.models.miner import Miner
from miner_tpu.models.fastformer import Fastformer, FastformerUserModel
from miner_tpu.models.unbert import UNBert
from miner_tpu.models.unisrec import UniSRec

__all__ = [
    "PLMConfig",
    "TransformerPLM",
    "NewsEncoder",
    "NewsEncoderMoe",
    "MoEAdaptor",
    "PolyAttention",
    "TargetAwareAttention",
    "Miner",
    "Fastformer",
    "FastformerUserModel",
    "UNBert",
    "UniSRec",
]

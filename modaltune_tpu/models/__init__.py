from .registry import AGGREGATORS, create_aggregator, register_aggregator
from .layers import (AlphaDropout, CrossAttentionLayer, DropPath, FFNLayer,
                     SelfAttentionLayer, TorchMHA)
from .longnet import (DilatedSelfAttention, FeedForwardNetwork,
                      LongNetEncoder, LongNetEncoderLayer)
from .slide_encoder import LongNetViT, PatchEmbed, coords_pos_embed
from .gene import GeneMixerEncoder, GeneOnlyModel
from .heads import classifier_logits, survival_from_logits
from .adapter import Extractor, Injector, InteractionBlock
from .mil import (AbmilModel, GatedAttentionPool, NystromSelfAttention,
                  TransMilModel)
from .modaltune import ModalTuneModel
from .titan import (AttentionalPooler, TitanModalTuneModel, TitanViT,
                    alibi_bias, grid_scatter_bag)

__all__ = [
    "AGGREGATORS", "create_aggregator", "register_aggregator",
    "AlphaDropout", "CrossAttentionLayer", "DropPath", "FFNLayer",
    "SelfAttentionLayer", "TorchMHA", "DilatedSelfAttention",
    "FeedForwardNetwork", "LongNetEncoder", "LongNetEncoderLayer",
    "LongNetViT", "PatchEmbed", "coords_pos_embed", "GeneMixerEncoder",
    "GeneOnlyModel", "classifier_logits", "survival_from_logits",
    "Extractor", "Injector", "InteractionBlock", "ModalTuneModel",
    "AbmilModel", "GatedAttentionPool", "NystromSelfAttention",
    "TransMilModel",
    "AttentionalPooler", "TitanModalTuneModel", "TitanViT", "alibi_bias",
    "grid_scatter_bag",
]

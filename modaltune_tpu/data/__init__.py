from .pathways import GenePacker, pathway_gene_groups, synthetic_pathways
from .datasets import (Batch, BucketedLoader, DEFAULT_BUCKETS, Example,
                       FeatureBagDataset, SubsetDataset, TitanGridDataset,
                       SyntheticSlideDataset, choose_bucket, collate,
                       kfold_splits, load_embedding_dict,
                       load_feature_bag, load_gene_csv,
                       load_split_json, pad_bag)

__all__ = [
    "GenePacker", "pathway_gene_groups", "synthetic_pathways", "Batch",
    "BucketedLoader", "DEFAULT_BUCKETS", "Example", "FeatureBagDataset",
    "SyntheticSlideDataset", "choose_bucket", "collate",
    "load_embedding_dict", "load_feature_bag", "load_gene_csv",
    "load_split_json", "pad_bag",
    "SubsetDataset", "TitanGridDataset", "kfold_splits",
]

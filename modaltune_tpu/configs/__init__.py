from .configs import (AdapterConfig, GeneEncoderConfig, LongNetConfig,
                      ModalTuneConfig, SlideEncoderConfig, TitanConfig,
                      TitanModalTuneConfig, TrainConfig,
                      gigapath_modaltune_config, longnet_config_by_name,
                      model_config_from_dict, optimal_segment_lengths,
                      tiny_test_config)

__all__ = [
    "AdapterConfig", "GeneEncoderConfig", "LongNetConfig", "ModalTuneConfig",
    "SlideEncoderConfig", "TitanConfig", "TitanModalTuneConfig",
    "TrainConfig", "gigapath_modaltune_config",
    "longnet_config_by_name", "model_config_from_dict",
    "optimal_segment_lengths", "tiny_test_config",
]

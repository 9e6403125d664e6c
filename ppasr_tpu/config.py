"""Config system: YAML file → attribute-access tree.

Mirrors the reference three-tier config surface (SURVEY.md §5.6; reference
ppasr/trainer.py:52-57): a per-model YAML with sections ``encoder_conf``,
``decoder_conf``, ``model_conf``, ``dataset_conf``, ``preprocess_conf``,
``ctc_beam_search_decoder_conf``, ``optimizer_conf``, ``train_conf`` plus
top-level ``use_model`` / ``streaming`` / ``decoder`` / ``metrics_type``,
a JSON augmentation pipeline spec, and argparse CLI flags.
"""
import json
import os

import yaml

from ppasr_tpu.utils.common import AttrDict, dict_to_object

REQUIRED_TOP_LEVEL = ("use_model", "dataset_conf", "preprocess_conf", "train_conf")


def load_config(path_or_dict) -> AttrDict:
    """Load a YAML config file (or wrap an existing dict) into an AttrDict."""
    if isinstance(path_or_dict, dict):
        cfg = dict(path_or_dict)
    else:
        with open(path_or_dict, "r", encoding="utf-8") as f:
            cfg = yaml.safe_load(f)
    for key in REQUIRED_TOP_LEVEL:
        if key not in cfg:
            raise ValueError(f"config missing required section/key: {key}")
    return dict_to_object(cfg)


def load_augmentation_config(path: str) -> list:
    """Load the JSON augmentation pipeline spec (reference configs/augmentation.json)."""
    if path is None or not os.path.exists(path):
        return []
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)

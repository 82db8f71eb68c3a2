"""
Dataset-JSON layer.

Parity target: adell_mri/utils/dataset.py (Dataset :73, subsample_dataset :25,
to_datalist :189, apply_filters :271). Datasets are JSON/YAML files mapping
``{id: {key: path-or-value}}``; this class loads, merges, filters,
subsamples and converts them to flat datalists consumed by the loader.
"""

import json
import os
from copy import deepcopy
from dataclasses import dataclass, field
from typing import Any, Iterator, List, Union

import numpy as np
import yaml

from adell_mri_tpu.custom_types import DataList, DatasetDict
from adell_mri_tpu.data.filters import (
    fill_conditional,
    fill_missing_with_value,
    filter_dictionary,
)
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)


def parse_ids(
    id_list: Union[List[str], str], output_format: str = "nested_list"
):
    """
    Parses ID specifications: each element is either a path to a
    JSON/YAML/CSV/txt file of IDs, a comma-separated string of IDs, or a
    plain ID. ``output_format`` is "list" (flat) or "nested_list" (one list
    per element). Parity: adell_mri/utils/parser.py (parse_ids).
    """

    def parse_one(x: str) -> List[str]:
        if isinstance(x, (list, tuple)):
            return [str(i) for i in x]
        x = str(x)
        if os.path.isfile(x):
            if x.endswith(".json"):
                with open(x) as f:
                    data = json.load(f)
                return [str(i) for i in (data if isinstance(data, list) else data.keys())]
            if x.endswith((".yaml", ".yml")):
                with open(x) as f:
                    data = yaml.safe_load(f)
                return [str(i) for i in (data if isinstance(data, list) else data.keys())]
            with open(x) as f:
                return [
                    token
                    for line in f
                    for token in line.strip().split(",")
                    if token
                ]
        return [i for i in x.split(",") if i]

    if id_list is None:
        return [] if output_format == "list" else []
    if isinstance(id_list, str):
        id_list = [id_list]
    nested = [parse_one(x) for x in id_list]
    if output_format == "list":
        return [i for sub in nested for i in sub]
    return nested


def subsample_dataset(
    data_dict: DatasetDict,
    subsample_size: int,
    rng: np.random.Generator,
    strata_key: str = None,
) -> DatasetDict:
    """
    Randomly subsamples ``data_dict`` down to ``subsample_size`` entries,
    optionally stratified on ``strata_key`` so each stratum keeps its
    original proportion (parity: utils/dataset.py:25).
    """
    if subsample_size is None or len(data_dict) <= subsample_size:
        return data_dict
    if strata_key is not None:
        strata: dict = {}
        for k, entry in data_dict.items():
            strata.setdefault(entry[strata_key], []).append(k)
        # largest-remainder allocation: flooring every quota drops minority
        # strata entirely (proportion < 1/subsample_size -> n = 0) and
        # returns fewer than subsample_size entries
        quotas = {
            s: len(keys) / len(data_dict) * subsample_size
            for s, keys in strata.items()
        }
        counts = {s: int(q) for s, q in quotas.items()}
        short = subsample_size - sum(counts.values())
        for s in sorted(
            quotas, key=lambda s: quotas[s] - counts[s], reverse=True
        )[:short]:
            counts[s] += 1
        keep = []
        for s, keys in strata.items():
            n = min(counts[s], len(keys))
            keep.extend(rng.choice(keys, size=n, replace=False, shuffle=False))
    else:
        keep = rng.choice(list(data_dict), size=subsample_size, replace=False)
    return {k: data_dict[k] for k in keep}


@dataclass
class Dataset:
    """
    Loads, merges, filters and subsamples dataset-JSON files
    (parity: utils/dataset.py:73; same constructor and method surface).
    """

    path: Union[str, List[str], None]
    rng: np.random.Generator = None
    seed: int = 42
    dataset_name: str = "dataset"
    dataset: DatasetDict = field(default_factory=dict, init=False)

    def __post_init__(self):
        self.dataset = {}
        self.load_dataset(self.path)
        self.dataset_original = deepcopy(self.dataset)
        if self.rng is None:
            self.rng = np.random.default_rng(self.seed)

    def load_dataset(self, path: Union[str, List[str], None]):
        if path is None:
            return
        if isinstance(path, (list, tuple)):
            for p in path:
                self.load_dataset(p)
            return
        with open(path) as f:
            if str(path).endswith((".yaml", ".yml")):
                loaded = yaml.safe_load(f)
            else:
                loaded = json.load(f)
        self.dataset.update(loaded)

    def fill_conditional(self, filters: List[str] = None):
        if filters is not None:
            self.dataset = fill_conditional(self.dataset, filters)

    def fill_missing_with_value(self, filters: List[str] = None):
        if filters is not None:
            self.dataset = fill_missing_with_value(self.dataset, filters)

    def filter_dictionary(
        self,
        filters_presence: List[str] = None,
        filters_existence: List[str] = None,
        possible_labels: List[str] = None,
        label_key: str = None,
        filters: List[str] = None,
        filter_is_optional: bool = False,
        fill_conditional: List[str] = None,
        fill_missing_with_value: List[str] = None,
    ):
        self.fill_conditional(fill_conditional)
        self.fill_missing_with_value(fill_missing_with_value)
        self.dataset = filter_dictionary(
            self.dataset,
            filters_presence=filters_presence,
            filters_existence=filters_existence,
            possible_labels=possible_labels,
            label_key=label_key,
            filters=filters,
            filter_is_optional=filter_is_optional,
        )

    def subsample_dataset(
        self,
        subsample_size: int = None,
        strata_key: str = None,
        key_list: Union[List[str], str] = None,
        excluded_key_list: Union[List[str], str] = None,
    ):
        n_start = len(self.dataset)
        if key_list is not None:
            keep = set(parse_ids(key_list, "list"))
            self.dataset = {k: v for k, v in self.dataset.items() if k in keep}
        elif excluded_key_list is not None:
            drop = set(parse_ids(excluded_key_list, "list"))
            self.dataset = {
                k: v for k, v in self.dataset.items() if k not in drop
            }
        elif subsample_size is not None:
            self.dataset = subsample_dataset(
                self.dataset, subsample_size, self.rng, strata_key
            )
        logger.info(
            "%s: %d -> %d samples", self.dataset_name, n_start, len(self)
        )

    def apply_filters(self, **filter_dict: Any):
        """
        Applies the full filter battery; recognised keys match the reference
        (utils/dataset.py:271): fill_conditional,
        fill_missing_with_placeholder, possible_labels, label_keys,
        presence_keys, filters_existence, filter_on_keys, filter_is_optional,
        excluded_ids, subsample_size.
        """
        if "fill_conditional" in filter_dict:
            self.fill_conditional(filter_dict["fill_conditional"])
        if "fill_missing_with_placeholder" in filter_dict:
            self.fill_missing_with_value(
                filter_dict["fill_missing_with_placeholder"]
            )
        self.filter_dictionary(
            possible_labels=filter_dict.get("possible_labels"),
            label_key=filter_dict.get("label_keys"),
            filters_presence=filter_dict.get("presence_keys"),
            filters_existence=filter_dict.get("filters_existence"),
            filters=filter_dict.get("filter_on_keys"),
            filter_is_optional=filter_dict.get("filter_is_optional", False),
        )
        if "excluded_ids" in filter_dict:
            self.subsample_dataset(
                excluded_key_list=filter_dict["excluded_ids"]
            )
        if "subsample_size" in filter_dict:
            self.subsample_dataset(
                subsample_size=filter_dict["subsample_size"],
                strata_key=filter_dict.get("label_keys"),
            )

    def to_datalist(self, key_list: List[str] = None) -> DataList:
        """Flattens to ``[{**entry, "identifier": id}, ...]``."""
        if key_list is None:
            keys = list(self.dataset)
        else:
            wanted = set(parse_ids(key_list, "list"))
            keys = [k for k in self.dataset if k in wanted]
        return [{**self.dataset[k], "identifier": k} for k in keys]

    def keys(self):
        return self.dataset.keys()

    def __getitem__(self, key):
        if isinstance(key, (list, tuple)):
            return {k: self.dataset[k] for k in key}
        return self.dataset[key]

    def __setitem__(self, key: str, value: Any):
        self.dataset[key] = value

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self) -> Iterator[str]:
        yield from self.dataset

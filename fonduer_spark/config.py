"""Engine configuration (the reference's .fonduer-config.yaml equivalent).

The reference searches parent directories for ``.fonduer-config.yaml`` and
merges it over defaults (/root/reference/src/fonduer/utils/config.py:11-78).
This engine does the same with ``.fonduer-spark.json`` (stdlib json — no
yaml dependency in this container; a yaml file is also accepted when pyyaml
is installed). Keys mirror the reference featurization/learning sections.
"""

from __future__ import annotations

import json
import os
from copy import deepcopy
from typing import Any, Dict, Optional

DEFAULTS: Dict[str, Any] = {
    "featurization": {
        "textual": {"window_feature": {"size": 3}, "word_feature": {"window": 7}},
        "tabular": {"unary_features": {"get_cell_ngrams": {"max": 2},
                                       "get_row_ngrams": {"max": 2},
                                       "get_col_ngrams": {"max": 2}},
                    "binary_features": {"min_row_diff": {"absolute": False},
                                        "min_col_diff": {"absolute": False}}},
    },
    "learning": {"LSTM": {"emb_dim": 100, "hidden_dim": 100},
                 "logreg": {"lr": 0.5, "l2": 1e-3, "epochs": 200}},
}

_FILENAMES = (".fonduer-spark.json", ".fonduer-config.yaml")


def _merge(base: Dict[str, Any], over: Dict[str, Any]) -> Dict[str, Any]:
    out = deepcopy(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def get_config(path: Optional[str] = None) -> Dict[str, Any]:
    """Search ``path`` (default cwd) and its parents for a config file;
    merge over DEFAULTS (reference config.py:58-78 search behavior)."""
    current = os.path.abspath(path or os.getcwd())
    while True:
        for fname in _FILENAMES:
            fp = os.path.join(current, fname)
            if os.path.isfile(fp):
                try:
                    if fp.endswith(".json"):
                        with open(fp) as f:
                            return _merge(DEFAULTS, json.load(f))
                    import yaml  # type: ignore

                    with open(fp) as f:
                        return _merge(DEFAULTS, yaml.safe_load(f) or {})
                except ImportError:
                    continue
        parent = os.path.dirname(current)
        if parent == current:
            return deepcopy(DEFAULTS)
        current = parent

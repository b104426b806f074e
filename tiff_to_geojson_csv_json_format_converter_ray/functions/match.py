"""Fuzzy layer-name pattern matching (reference J5).

Reimplements the semantics of ``layer_pattern_manager.py:116-154``
(``test_pattern``) and its JSON config (``layer_patterns_config.json``):
substring containment -- for each configured category, if a
``search_term`` is contained in the requested name, the first available
layer containing any of its ``match_terms`` wins; otherwise the
fallback patterns; case folding per the ``case_sensitive`` flag; None
when nothing matches.  Dict iteration order (insertion order) matches
the reference's behavior on its own config.

This is a driver-side resolver over a small dimension table (SURVEY
par.2.6); at scale it becomes a broadcast map-side join.
"""

from __future__ import annotations

import json
from pathlib import Path

DEFAULT_CONFIG: dict = {
    "layer_pattern_config": {
        "location_patterns": {
            "delhi": ["delhi", "mosaic", "ncr"],
            "mumbai": ["mumbai", "mosaic", "maharashtra"],
            "bangalore": ["bangalore", "bengaluru", "mosaic", "karnataka"],
            "chennai": ["chennai", "madras", "mosaic", "tamilnadu"],
            "kolkata": ["kolkata", "calcutta", "mosaic", "westbengal"],
            "hyderabad": ["hyderabad", "mosaic", "telangana"],
            "pune": ["pune", "mosaic", "maharashtra"],
            "ahmedabad": ["ahmedabad", "mosaic", "gujarat"],
            "jaipur": ["jaipur", "mosaic", "rajasthan"],
            "lucknow": ["lucknow", "mosaic", "uttarpradesh"],
        },
        "terrain_patterns": {
            "elevation": ["elevation", "dem", "dtm", "height", "mosaic", "altitude"],
            "slope": ["slope", "gradient", "mosaic", "incline"],
            "aspect": ["aspect", "orientation", "mosaic", "direction"],
            "hillshade": ["hillshade", "shaded", "relief", "mosaic", "shadow"],
            "contour": ["contour", "isoline", "mosaic", "elevation_lines"],
            "roughness": ["roughness", "terrain", "mosaic"],
            "curvature": ["curvature", "mosaic", "terrain"],
        },
        "data_type_patterns": {
            "satellite": ["satellite", "landsat", "sentinel", "modis", "mosaic", "imagery"],
            "aerial": ["aerial", "orthophoto", "imagery", "mosaic", "drone"],
            "radar": ["radar", "sar", "mosaic", "synthetic"],
            "lidar": ["lidar", "pointcloud", "mosaic", "laser"],
            "ndvi": ["ndvi", "vegetation", "mosaic", "greenness"],
            "landuse": ["landuse", "landcover", "mosaic", "classification"],
            "water": ["water", "hydro", "mosaic", "rivers", "lakes"],
            "roads": ["roads", "transportation", "mosaic", "highways"],
            "buildings": ["buildings", "structures", "mosaic", "urban"],
        },
        "temporal_patterns": {
            "2024": ["2024", "mosaic", "recent"],
            "2023": ["2023", "mosaic"],
            "2022": ["2022", "mosaic"],
            "2021": ["2021", "mosaic"],
            "2020": ["2020", "mosaic"],
            "current": ["current", "latest", "mosaic", "recent"],
            "historical": ["historical", "archive", "mosaic", "old"],
        },
        "resolution_patterns": {
            "high": ["high", "detailed", "mosaic", "fine"],
            "medium": ["medium", "mosaic", "standard"],
            "low": ["low", "coarse", "mosaic", "overview"],
            "1m": ["1m", "1meter", "mosaic"],
            "5m": ["5m", "5meter", "mosaic"],
            "10m": ["10m", "10meter", "mosaic"],
            "30m": ["30m", "30meter", "mosaic"],
        },
    },
    "fallback_patterns": ["mosaic", "composite", "merged", "combined", "processed"],
    "exact_match_priority": True,
    "case_sensitive": False,
}


def load_config(path: str | Path | None = None) -> dict:
    if path is None:
        # deep copy so mutation helpers never touch the module default
        return json.loads(json.dumps(DEFAULT_CONFIG))
    try:
        return json.loads(Path(path).read_text())
    except (FileNotFoundError, json.JSONDecodeError):
        # reference behavior: fall back to a default config rather than
        # erroring (layer_pattern_manager.py:22-29)
        return json.loads(json.dumps(DEFAULT_CONFIG))


def save_config(config: dict, path: str | Path) -> None:
    Path(path).write_text(json.dumps(config, indent=2))


def add_pattern(
    config: dict, category: str, search_term: str, matches: list[str]
) -> dict:
    """Add/replace ``category.search_term -> matches``
    (layer_pattern_manager.py:57-64)."""
    config.setdefault("layer_pattern_config", {}).setdefault(category, {})[
        search_term
    ] = list(matches)
    return config


def remove_pattern(config: dict, category: str, search_term: str) -> bool:
    """Remove a pattern; False when absent (manager:66-74)."""
    try:
        del config["layer_pattern_config"][category][search_term]
        return True
    except KeyError:
        return False


def add_fallback(config: dict, pattern: str) -> dict:
    fb = config.setdefault("fallback_patterns", [])
    if pattern not in fb:
        fb.append(pattern)
    return config


def remove_fallback(config: dict, pattern: str) -> bool:
    try:
        config.setdefault("fallback_patterns", []).remove(pattern)
        return True
    except ValueError:
        return False


def list_patterns(config: dict, category: str | None = None) -> dict:
    """Structured form of the manager's list output (manager:76-94):
    {categories: {cat: {term: matches}}, fallback_patterns, case_sensitive}."""
    cats = config.get("layer_pattern_config", {})
    if category is not None:
        cats = {category: cats.get(category, {})}
    return {
        "categories": cats,
        "fallback_patterns": config.get("fallback_patterns", []),
        "case_sensitive": config.get("case_sensitive", False),
    }


def find_layer_by_patterns(
    requested_layer: str,
    available_layers: list[str],
    config: dict | None = None,
) -> str | None:
    """First configured-pattern match, then fallback patterns, else None."""
    cfg = config or DEFAULT_CONFIG
    layer_patterns = cfg.get("layer_pattern_config", {})
    case_sensitive = cfg.get("case_sensitive", False)
    fallback_patterns = cfg.get("fallback_patterns", [])

    if case_sensitive:
        layer_search = requested_layer
        available_norm = list(available_layers)
    else:
        layer_search = requested_layer.lower()
        available_norm = [layer.lower() for layer in available_layers]

    for patterns in layer_patterns.values():
        for search_term, possible_matches in patterns.items():
            if search_term in layer_search:
                for i, avail in enumerate(available_norm):
                    for match_term in possible_matches:
                        if match_term in avail:
                            return available_layers[i]

    for fallback in fallback_patterns:
        for i, avail in enumerate(available_norm):
            if fallback in avail:
                return available_layers[i]
    return None

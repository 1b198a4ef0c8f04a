"""Minimal configargparse-compatible argument parser.

The reference uses the third-party ``configargparse`` package (train.py:317,
configs/__init__.py:1): CLI flags override values from a YAML config file
passed with ``-c``, which override Python defaults. That package is not in
this image, so this module provides the small subset the entry scripts need:

  - ``ArgParser(default_config_files=[...])``
  - ``parser.add_argument(..., is_config_file=True)`` for the ``-c`` flag
  - YAML values (including ``2e-4``-style floats and ``[4, 2]`` lists) are
    applied with correct types; CLI flags still win.
"""

import argparse
import os

import yaml


class ArgParser(argparse.ArgumentParser):
    def __init__(self, default_config_files=None, **kwargs):
        super().__init__(**kwargs)
        self._default_config_files = list(default_config_files or [])
        self._config_file_dests = []

    def add_argument(self, *args, **kwargs):
        is_config_file = kwargs.pop("is_config_file", False)
        action = super().add_argument(*args, **kwargs)
        if is_config_file:
            self._config_file_dests.append(action.dest)
        return action

    def parse_args(self, args=None, namespace=None):
        ns, _ = self.parse_known_args(args, namespace)
        return ns

    def parse_known_args(self, args=None, namespace=None):
        ns, extras = super().parse_known_args(args, namespace)

        config_paths = list(self._default_config_files)
        for dest in self._config_file_dests:
            val = getattr(ns, dest, None)
            if val:
                config_paths.append(val)

        config_values = {}
        for path in config_paths:
            if not os.path.exists(path):
                continue
            with open(path) as f:
                data = yaml.safe_load(f) or {}
            config_values.update(data)

        if config_values:
            # Re-parse so explicit CLI flags keep precedence over config
            # values, which keep precedence over the Python defaults.
            defaults = {}
            for key, value in config_values.items():
                action = next(
                    (a for a in self._actions if a.dest == key), None
                )
                if action is None:
                    continue
                defaults[key] = _coerce(value, action)
            self.set_defaults(**defaults)
            ns, extras = super().parse_known_args(args, namespace)

        return ns, extras


def _coerce(value, action):
    """Coerce a YAML value to the argument's declared type."""
    if isinstance(action, argparse._StoreTrueAction):
        return bool(value)
    if action.nargs in ("+", "*") and isinstance(value, (list, tuple)):
        if action.type is not None:
            return [action.type(v) for v in value]
        return list(value)
    if action.type is not None and value is not None:
        # YAML parses e.g. 2e-4 as float already, but "2e-4" in some
        # hand-written files comes through as str; 20_000 as int.
        return action.type(value)
    return value

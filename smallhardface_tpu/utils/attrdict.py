"""Attribute-style nested dict used for the global config tree.

TPU-native re-implementation of the role played by ``easydict.EasyDict``
in the reference (/root/reference/lib/utils/get_config.py:7,30).
"""

from __future__ import annotations


class AttrDict(dict):
    """A dict whose items are also reachable as attributes, recursively."""

    def __init__(self, mapping=None, **kwargs):
        super().__init__()
        if mapping is None:
            mapping = {}
        for k, v in {**dict(mapping), **kwargs}.items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, AttrDict):
            value = AttrDict(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                AttrDict(v) if isinstance(v, dict) and not isinstance(v, AttrDict)
                else v
                for v in value)
        super().__setitem__(key, value)

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def copy(self):
        return AttrDict({
            k: (v.copy() if isinstance(v, AttrDict) else v)
            for k, v in self.items()
        })

"""Data layer: datasets, mappers, loaders, tokenizer.

``data_registry`` mirrors the reference's ``data/__init__.py`` keys:
``annoindexed`` (annotation-JSON map-style, data/IndexAnno.py) and
``srcindexed`` (tar-shard streaming, data/IndexSrc.py). Imported lazily so
light users (tokenizer-only) don't pull the full pipeline.
"""


def _registry():
    from vast_tpu.data.anno_dataset import AnnoIndexedDataset
    from vast_tpu.data.src_dataset import SrcIndexedDataset

    return {
        "annoindexed": AnnoIndexedDataset,
        "srcindexed": SrcIndexedDataset,
    }


class _LazyRegistry(dict):
    def __missing__(self, key):
        self.update(_registry())
        return dict.__getitem__(self, key)


data_registry = _LazyRegistry()

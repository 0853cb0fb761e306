"""Model zoo + registry (reference: model/__init__.py ``model_registry``)."""


def _registry():
    from vast_tpu.models.vast import VASTModel

    return {"vast": VASTModel}


class _LazyRegistry(dict):
    def __missing__(self, key):
        self.update(_registry())
        return dict.__getitem__(self, key)


model_registry = _LazyRegistry()

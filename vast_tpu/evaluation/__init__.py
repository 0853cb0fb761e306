"""Evaluation registry (reference: evaluation/__init__.py)."""


def _registry():
    from vast_tpu.evaluation.evaluation_mm import evaluate_mm

    return {"evaluation_mm": evaluate_mm}


class _LazyRegistry(dict):
    def __missing__(self, key):
        self.update(_registry())
        return dict.__getitem__(self, key)


evaluation_registry = _LazyRegistry()

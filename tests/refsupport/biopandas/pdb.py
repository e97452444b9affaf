class PandasPdb:  # pragma: no cover
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("biopandas is not installed in this environment")

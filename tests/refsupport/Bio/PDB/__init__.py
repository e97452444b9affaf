class PDBParser:  # pragma: no cover - the reference parser is never invoked
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "BioPython is not installed; tests feed the reference pipeline "
            "from pre-parsed samples instead."
        )

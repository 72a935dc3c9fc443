from .tf_import import load_tf_checkpoint, map_reference_variables

__all__ = ["map_reference_variables", "load_tf_checkpoint", "ref_harness"]

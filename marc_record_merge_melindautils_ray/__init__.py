"""Ray-Data-native near-duplicate detection, clustering and preferred-record
merge engine over tables of (audio clip, transcript) pairs.

Semantics derived from the reference ``NatLibFi/marc-record-merge-melindautils``
(see SURVEY.md for the full file:line mapping); architecture is idiomatic Ray
Data: ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages, ``groupby`` shuffles for the wide
steps.
"""

from marc_record_merge_melindautils_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"

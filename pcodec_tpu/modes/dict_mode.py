"""Dict mode: dictionary of unique raw values, primary latent = u32 index.

ref: pco/src/mode/dict.rs. The dictionary is sorted by frequency descending
(ties in first-unique order; the reference's tie order is unspecified since it
uses an unstable sort over HashMap iteration order).
"""

import numpy as np

from pcodec_tpu.dtypes import NumberType


def configure_and_split_latents(nt: NumberType, nums: np.ndarray):
    """Returns (dict_latents, index_latents_u32)."""
    latents = nt.to_latent_ordered(nums)
    uniq, inverse, counts = np.unique(latents, return_inverse=True, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    dictionary = uniq[order]
    # map old unique index -> dict position
    rank = np.empty(len(uniq), dtype=np.uint32)
    rank[order] = np.arange(len(uniq), dtype=np.uint32)
    idxs = rank[inverse]
    return dictionary, idxs.astype(np.uint32)

"""Pure-Python chemistry kernel (RDKit-free).

Provides SMILES parsing, sanitization (kekulization, aromaticity, implicit
hydrogens, hybridization, conjugation), ring perception, Gasteiger PEOE
partial charges, CIP stereo labels, pharmacophore perception, and canonical
SMILES output — the subset of RDKit functionality the reference featurizer
depends on (``gt_pyg/data/*.py``).

RDKit is never required; the optional ChEMBL standardization path
(:func:`gt_pyg_tpu.data.featurize.standardize_smiles`) uses RDKit +
chembl_structure_pipeline only when those extras are installed.
"""

from .mol import (  # noqa: F401
    Mol, Atom, Bond, SanitizeError,
    SINGLE, DOUBLE, TRIPLE, AROMATIC,
    CHI_UNSPECIFIED, CHI_CW, CHI_CCW, CHI_OTHER,
    STEREONONE, STEREOZ, STEREOE, STEREOCIS, STEREOTRANS, STEREOANY,
)
from .smiles_parser import parse_smiles, SmilesParseError  # noqa: F401

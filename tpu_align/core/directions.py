"""Traceback direction codes, shared by oracle, kernels, and traceback.

Semantics follow the reference's enums (c++/backtrack.h:14-33):
  directionMain {NONE_MAIN, MATCH, MISMATCH, QUERY_INSERTION, QUERY_DELETION}
  directionIndel {NONE_INDEL, GAP_OPEN, GAP_EXTEND}
with our own stable numeric values.

A QUERY_DELETION consumes one query char against a gap in the reference
(moves up one row); a QUERY_INSERTION consumes one reference char against a
gap in the query (moves left one column).  MATCH/MISMATCH consume one of
each (move diagonally).  Alignment display (c++/backtrack.cpp:21-81):
relation char '*' for match, '|' for mismatch, ' ' for gaps; the consumed
gap is shown as '_' in the sequence line.
"""

# --- main matrix directions (2 bits when NONE cannot occur, else 3 values+) ---
NONE = 0
MATCH = 1
MISMATCH = 2
QUERY_DELETION = 3  # came from above (gap in reference)
QUERY_INSERTION = 4  # came from the left (gap in query)

# --- indel (E/F) matrix directions for the affine aligner ---
NONE_INDEL = 0
GAP_OPEN = 1
GAP_EXTEND = 2

# --- packed-cell encoding used by kernels and traceback -----------------------
# Kernels pack direction codes along the QUERY-ROW axis into int32 words:
# 2 bits/cell (16 rows per word) for the linear aligners, 4 bits/cell
# (8 rows per word) for affine -- see kernels/fill.py bits_per_cell.  This
# is the TPU counterpart of the reference's byte-per-cell directionMain
# matrices (which V17 re-laid-out for coalescing,
# cuda/LNW/LinearNeedlemanWunschV17.cu:107-118) -- we keep lanes coalesced
# by construction and shrink HBM traffic 16x (8x affine) instead.
#
# bits [1:0]: main direction, encoded as MAIN_* below
# bit  [2]:   affine E (query-insertion matrix) came-from: 0=GAP_OPEN, 1=GAP_EXTEND
# bit  [3]:   affine F (query-deletion matrix) came-from: 0=GAP_OPEN, 1=GAP_EXTEND
#
# Local aligners store NO stop/NONE state: a clamped-to-zero cell is
# detected by the walker's backward re-scoring (the remaining score reaches
# 0 exactly at the path start -- tpu_align/traceback/host.py
# _walk_local_rescore), so the 2 main bits suffice for the linear aligners.
MAIN_DIAG_MATCH = 0
MAIN_DIAG_MISMATCH = 1
MAIN_QUERY_DELETION = 2
MAIN_QUERY_INSERTION = 3

BIT_E_EXTEND = 4  # bit 2 set -> E came from GAP_EXTEND (affine)
BIT_F_EXTEND = 8  # bit 3 set -> F came from GAP_EXTEND (affine)

MAIN_TO_DIRECTION = {
    MAIN_DIAG_MATCH: MATCH,
    MAIN_DIAG_MISMATCH: MISMATCH,
    MAIN_QUERY_DELETION: QUERY_DELETION,
    MAIN_QUERY_INSERTION: QUERY_INSERTION,
}

# Relation-line characters (c++/backtrack.cpp: '*' match, '|' mismatch, ' ' gap)
REL_MATCH = "*"
REL_MISMATCH = "|"
REL_GAP = " "
GAP_CHAR = "_"

/* MKL stub for building the reference ABIP-QCP with the QDLDL backend
   only (linsys_solver=1).  Every MKL entry point is declared as an
   inline no-op returning -1; the driver never selects an MKL backend.
   See tools/reference_qcp_driver_notes.md. */
#ifndef MKL_TYPES_STUB_H
#define MKL_TYPES_STUB_H
typedef int MKL_INT;
typedef void *_MKL_DSS_HANDLE_t;
typedef int _INTEGER_t;
typedef double _DOUBLE_PRECISION_t;
typedef char _CHARACTER_t;
#endif

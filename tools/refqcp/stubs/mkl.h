/* MKL umbrella stub (see mkl_types.h header comment). */
#ifndef MKL_STUB_H
#define MKL_STUB_H
#include "mkl_types.h"
#endif

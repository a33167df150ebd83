#ifndef GOLDEN_CEREAL_SHIM_VECTOR_HPP
#define GOLDEN_CEREAL_SHIM_VECTOR_HPP
#include "../cereal_shim.hpp"
#endif

#ifndef GOLDEN_CEREAL_SHIM_ARRAY_HPP
#define GOLDEN_CEREAL_SHIM_ARRAY_HPP
#include "../cereal_shim.hpp"
#endif

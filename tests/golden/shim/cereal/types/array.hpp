// Empty cereal shim: the reference headers include cereal for their
// serialize() templates, which the golden generator never instantiates.
#ifndef GOLDEN_CEREAL_SHIM_ARRAY_HPP
#define GOLDEN_CEREAL_SHIM_ARRAY_HPP
#endif

// Minimal cxxopts-compatible shim (original code): implements exactly the
// command-line parsing surface the reference PLSSVM uses — Options with
// chained configuration, add_options()(short,long / long-only, description,
// value<T>() with default_value / bool binding, value-name), positional
// mapping, ParseResult::count / operator[]::as<T>, and a plain help text.
// Values parse through operator>> (the reference's enums provide stream
// extraction), std::string passes through verbatim.
#ifndef PLSSVM_INTEROP_CXXOPTS_HPP_
#define PLSSVM_INTEROP_CXXOPTS_HPP_

#include <cctype>
#include <cstddef>
#include <initializer_list>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <type_traits>
#include <vector>

namespace cxxopts {

class OptionException : public std::runtime_error {
  public:
    using std::runtime_error::runtime_error;
};

namespace shim_detail {

struct value_base {
    std::string default_value_;
    bool has_default_ = false;
    bool is_bool_ = false;
    bool *bound_bool_ = nullptr;
    std::shared_ptr<value_base> default_value(const std::string &v) {
        default_value_ = v;
        has_default_ = true;
        return self_.lock();
    }
    std::weak_ptr<value_base> self_;
};

template <typename T>
struct typed_value : value_base {};

template <typename T>
T parse_text(const std::string &text) {
    if constexpr (std::is_same_v<T, std::string>) {
        return text;
    } else if constexpr (std::is_same_v<T, bool>) {
        return text == "true" || text == "1";
    } else {
        T out{};
        std::istringstream is(text);
        is >> out;
        if (is.fail())
            throw OptionException("Argument '" + text + "' failed to parse");
        return out;
    }
}

struct option_spec {
    std::string short_name;
    std::string long_name;
    std::string description;
    std::string value_name;
    std::shared_ptr<value_base> value;
};

}  // namespace shim_detail

template <typename T>
std::shared_ptr<shim_detail::value_base> value() {
    auto v = std::make_shared<shim_detail::typed_value<T>>();
    v->self_ = v;
    v->is_bool_ = std::is_same_v<T, bool>;
    return v;
}

template <typename T>
std::shared_ptr<shim_detail::value_base> value(T &bound) {
    auto v = value<T>();
    if constexpr (std::is_same_v<T, bool>) v->bound_bool_ = &bound;
    return v;
}

class ParseResult {
  public:
    class proxy {
      public:
        proxy(const shim_detail::option_spec *spec,
              const std::vector<std::string> *raw)
            : spec_(spec), raw_(raw) {}

        template <typename T>
        T as() const {
            if (raw_ != nullptr && !raw_->empty())
                return shim_detail::parse_text<T>(raw_->back());
            if (spec_ != nullptr && spec_->value && spec_->value->has_default_)
                return shim_detail::parse_text<T>(spec_->value->default_value_);
            throw OptionException("Option has no value");
        }

      private:
        const shim_detail::option_spec *spec_;
        const std::vector<std::string> *raw_;
    };

    std::size_t count(const std::string &name) const {
        auto it = raw_.find(name);
        return it == raw_.end() ? 0 : it->second.size();
    }

    proxy operator[](const std::string &name) const {
        auto sit = specs_.find(name);
        auto rit = raw_.find(name);
        return proxy(sit == specs_.end() ? nullptr : sit->second,
                     rit == raw_.end() ? nullptr : &rit->second);
    }

    // populated by Options::parse
    std::map<std::string, std::vector<std::string>> raw_;
    std::map<std::string, const shim_detail::option_spec *> specs_;
};

class Options {
  public:
    Options(std::string program, std::string description = "")
        : program_(std::move(program)), description_(std::move(description)) {}

    Options &positional_help(const std::string &text) {
        positional_help_ = text;
        return *this;
    }
    Options &show_positional_help() { return *this; }
    Options &set_width(std::size_t) { return *this; }
    Options &set_tab_expansion(bool = true) { return *this; }

    class adder {
      public:
        explicit adder(Options *opts) : opts_(opts) {}
        adder &operator()(const std::string &names,
                          const std::string &description,
                          std::shared_ptr<shim_detail::value_base> value =
                              nullptr,
                          const std::string &value_name = "") {
            shim_detail::option_spec spec;
            if (auto comma = names.find(','); comma != std::string::npos) {
                spec.short_name = names.substr(0, comma);
                spec.long_name = names.substr(comma + 1);
            } else {
                spec.long_name = names;
            }
            spec.description = description;
            spec.value_name = value_name;
            spec.value = value ? value
                               : cxxopts::value<bool>();  // flag-only option
            opts_->specs_.push_back(std::move(spec));
            return *this;
        }

      private:
        Options *opts_;
    };

    adder add_options(const std::string & /*group*/ = "") {
        return adder(this);
    }

    void parse_positional(std::initializer_list<std::string> names) {
        positionals_.assign(names.begin(), names.end());
    }

    ParseResult parse(int argc, char **argv) {
        ParseResult result;
        for (const auto &spec : specs_)
            result.specs_[key(spec)] = &spec;
        std::size_t pos_index = 0;
        for (int i = 1; i < argc; ++i) {
            std::string arg = argv[i];
            if (arg.size() >= 2 && arg[0] == '-' &&
                !(arg.size() > 1 && (std::isdigit(arg[1]) || arg[1] == '.'))) {
                std::string name = arg.substr(arg[1] == '-' ? 2 : 1);
                std::string inline_value;
                bool has_inline = false;
                if (auto eq = name.find('='); eq != std::string::npos) {
                    inline_value = name.substr(eq + 1);
                    name = name.substr(0, eq);
                    has_inline = true;
                }
                const shim_detail::option_spec *spec = find(name);
                if (spec == nullptr)
                    throw OptionException("Option '" + arg +
                                          "' does not exist");
                if (spec->value->is_bool_) {
                    result.raw_[key(*spec)].push_back(
                        has_inline ? inline_value : "true");
                } else if (has_inline) {
                    result.raw_[key(*spec)].push_back(inline_value);
                } else {
                    if (i + 1 >= argc)
                        throw OptionException("Option '" + arg +
                                              "' is missing an argument");
                    result.raw_[key(*spec)].push_back(argv[++i]);
                }
            } else {
                if (pos_index >= positionals_.size())
                    throw OptionException("Too many positional arguments: '" +
                                          arg + "'");
                result.raw_[positionals_[pos_index++]].push_back(arg);
            }
        }
        // bound bools always receive a value (default or presence)
        for (const auto &spec : specs_) {
            if (spec.value->bound_bool_ != nullptr) {
                const auto it = result.raw_.find(key(spec));
                if (it != result.raw_.end() && !it->second.empty())
                    *spec.value->bound_bool_ =
                        shim_detail::parse_text<bool>(it->second.back());
                else if (spec.value->has_default_)
                    *spec.value->bound_bool_ = shim_detail::parse_text<bool>(
                        spec.value->default_value_);
            }
        }
        return result;
    }

    std::string help(const std::vector<std::string> & = {}) const {
        std::string out = "Usage:\n  " + program_ + " [OPTION...] " +
                          positional_help_ + "\n\n";
        for (const auto &spec : specs_) {
            if (!spec.value_name.empty() && spec.short_name.empty())
                continue;  // hidden positional slot
            out += "  ";
            if (!spec.short_name.empty()) out += "-" + spec.short_name + ", ";
            out += "--" + spec.long_name;
            if (!spec.value->is_bool_) out += " arg";
            if (spec.value->has_default_)
                out += " (default: " + spec.value->default_value_ + ")";
            out += "\n      " + spec.description + "\n";
        }
        return out;
    }

  private:
    std::string key(const shim_detail::option_spec &spec) const {
        return spec.long_name.empty() ? spec.short_name : spec.long_name;
    }
    const shim_detail::option_spec *find(const std::string &name) const {
        for (const auto &spec : specs_)
            if (spec.short_name == name || spec.long_name == name) return &spec;
        return nullptr;
    }

    std::string program_;
    std::string description_;
    std::string positional_help_;
    std::vector<shim_detail::option_spec> specs_;
    std::vector<std::string> positionals_;
};

}  // namespace cxxopts

#endif  // PLSSVM_INTEROP_CXXOPTS_HPP_

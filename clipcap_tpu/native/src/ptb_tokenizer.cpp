// PTB-style caption tokenizer — C++ replacement for the reference's
// Java subprocess (edu.stanford.nlp.process.PTBTokenizer -preserveLines
// -lowerCase + the wrapper's punctuation strip,
// /root/reference/clipcap/eval/pycocoevalcap/tokenizer/ptbtokenizer.py).
//
// Behavior is the spec defined by clipcap_tpu/eval/tokenization.py — the
// two are cross-tested for identical output. Hand-rolled scanner (no
// std::regex): lowercase → "cannot"/clitic splits → token scan → drop
// punctuation tokens.
#include <cctype>
#include <cstdlib>
#include <cstring>
#include <set>
#include <string>
#include <vector>

namespace {

bool is_alnum_l(char c) { return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'); }

const std::set<std::string>& punct_set() {
    static const std::set<std::string> s = {
        "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
        ".", "?", "!", ",", ":", "-", "--", "...", ";",
    };
    return s;
}

std::string bracket_token(char c) {
    switch (c) {
        case '(': return "-LRB-"; case ')': return "-RRB-";
        case '{': return "-LCB-"; case '}': return "-RCB-";
        case '[': return "-LSB-"; case ']': return "-RSB-";
        default: return std::string(1, c);
    }
}

// Clitic suffixes checked at an apostrophe or at the 'n' of "n't"; the
// match needs a right word-boundary (mirrors the Python \b).
bool clitic_at(const std::string& t, size_t i, size_t* len) {
    if (t[i] == 'n' && i + 2 < t.size() && t[i+1] == '\'' && t[i+2] == 't') {
        if (i + 3 >= t.size() || !is_alnum_l(t[i+3])) { *len = 3; return true; }
    }
    if (t[i] != '\'') return false;
    static const char* clitics[] = {"'re", "'ve", "'ll", "'s", "'d", "'m"};
    for (auto* c : clitics) {
        size_t n = std::strlen(c);
        if (t.compare(i, n, c) == 0
            && (i + n >= t.size() || !is_alnum_l(t[i + n]))) {
            *len = n;
            return true;
        }
    }
    return false;
}

std::vector<std::string> tokenize_line(const std::string& input) {
    // 1. lowercase
    std::string text;
    text.reserve(input.size());
    for (char c : input) text += static_cast<char>(std::tolower(static_cast<unsigned char>(c)));

    // 2. "cannot" -> "can not" (word boundaries)
    std::string t2;
    for (size_t i = 0; i < text.size();) {
        if (text.compare(i, 6, "cannot") == 0
            && (i == 0 || !is_alnum_l(text[i-1]))
            && (i + 6 >= text.size() || !is_alnum_l(text[i+6]))) {
            t2 += "can not";
            i += 6;
        } else {
            t2 += text[i++];
        }
    }

    // 3. separate clitics with a space: "dog's" -> "dog 's", "can't" -> "ca n't"
    std::string t3;
    for (size_t i = 0; i < t2.size();) {
        size_t len = 0;
        if (clitic_at(t2, i, &len)) {
            t3 += ' ';
            t3.append(t2, i, len);
            i += len;
        } else {
            t3 += t2[i++];
        }
    }

    // 4. scan tokens mirroring the Python _TOKEN regex alternation order:
    //    "..." | "--" | clitic | word([-'][word])* | single symbol
    std::vector<std::string> out;
    const std::string& t = t3;
    size_t i = 0;
    while (i < t.size()) {
        char c = t[i];
        if (std::isspace(static_cast<unsigned char>(c))) { ++i; continue; }
        std::string tok;
        if (t.compare(i, 3, "...") == 0) { tok = "..."; i += 3; }
        else if (t.compare(i, 2, "--") == 0) { tok = "--"; i += 2; }
        else {
            size_t clen = 0;
            if (clitic_at(t, i, &clen)) { tok = t.substr(i, clen); i += clen; }
            else if (is_alnum_l(c)) {
                size_t j = i;
                while (j < t.size() && is_alnum_l(t[j])) ++j;
                // extend through -word or 'word groups
                while (j < t.size() && (t[j] == '-' || t[j] == '\'')
                       && j + 1 < t.size() && is_alnum_l(t[j+1])) {
                    ++j;
                    while (j < t.size() && is_alnum_l(t[j])) ++j;
                }
                tok = t.substr(i, j - i);
                i = j;
            } else if (static_cast<unsigned char>(c) >= 0x80) {
                // UTF-8 multibyte sequence → one symbol token (the Python
                // spec treats one non-ascii char as one token).
                size_t j = i + 1;
                while (j < t.size() && (static_cast<unsigned char>(t[j]) & 0xC0) == 0x80) ++j;
                tok = t.substr(i, j - i);
                i = j;
            } else {
                tok = bracket_token(c);
                ++i;
            }
        }
        if (punct_set().count(tok)) continue;
        out.push_back(tok);
    }
    return out;
}

}  // namespace

extern "C" {

// Tokenize one line; returns a malloc'd space-joined string (caller frees
// with ccn_free).
char* ccn_ptb_tokenize(const char* line) {
    auto toks = tokenize_line(line ? line : "");
    std::string joined;
    for (size_t i = 0; i < toks.size(); ++i) {
        if (i) joined += ' ';
        joined += toks[i];
    }
    char* out = static_cast<char*>(std::malloc(joined.size() + 1));
    std::memcpy(out, joined.c_str(), joined.size() + 1);
    return out;
}

void ccn_free(char* p) { std::free(p); }

}  // extern "C"

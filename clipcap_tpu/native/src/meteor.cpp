// METEOR scorer core — C++ replacement for the reference's
// meteor-1.5.jar subprocess (/root/reference/clipcap/eval/pycocoevalcap/
// meteor/meteor.py). Behavior is the spec defined by
// clipcap_tpu/eval/meteor.py (exact + Porter-stem matcher stages, METEOR
// 1.5 English parameters); the two are cross-tested for identical scores.
#include <algorithm>
#include <cmath>
#include <cstring>
#include <set>
#include <sstream>
#include <string>
#include <vector>

#include "porter.h"

namespace {

constexpr double ALPHA = 0.85;
constexpr double BETA = 1.4;
constexpr double GAMMA = 0.6;
constexpr double DELTA = 0.75;
const double STAGE_WEIGHTS[2] = {1.0, 0.6};  // exact, stem

const std::set<std::string>& function_words() {
    // Keep in sync with clipcap_tpu/eval/meteor.py FUNCTION_WORDS.
    static const std::set<std::string> s = [] {
        const char* words =
            "a an the this that these those some any each every no "
            "i you he she it we they me him her us them my your his its our their "
            "mine yours hers ours theirs myself yourself himself herself itself ourselves themselves "
            "am is are was were be been being do does did doing have has had having "
            "will would shall should may might must can could ought "
            "and or but nor so yet for if while although though because since unless until when whenever "
            "where wherever whether as than that which who whom whose what "
            "in on at by with from into onto of to up down over under above below between among "
            "through during before after about against along around behind beside besides beyond "
            "despite except inside outside toward towards upon within without "
            "not n't there here then now just only also very too quite rather";
        std::set<std::string> out;
        std::istringstream iss(words);
        std::string w;
        while (iss >> w) out.insert(w);
        return out;
    }();
    return s;
}

std::vector<std::string> split_ws(const std::string& s) {
    std::vector<std::string> out;
    std::istringstream iss(s);
    std::string w;
    while (iss >> w) out.push_back(w);
    return out;
}

struct Match { int h, r, stage; };

// Stage-ordered greedy alignment: each unmatched hypothesis word matches the
// closest unmatched reference position (mirrors eval/meteor.py _align).
std::vector<Match> align(const std::vector<std::string>& hyp,
                         const std::vector<std::string>& ref) {
    std::vector<bool> h_used(hyp.size(), false), r_used(ref.size(), false);
    std::vector<std::string> hyp_stem(hyp.size()), ref_stem(ref.size());
    for (size_t i = 0; i < hyp.size(); ++i) hyp_stem[i] = clipcap_native::porter_stem(hyp[i]);
    for (size_t j = 0; j < ref.size(); ++j) ref_stem[j] = clipcap_native::porter_stem(ref[j]);

    std::vector<Match> matches;
    for (int stage = 0; stage < 2; ++stage) {
        for (size_t i = 0; i < hyp.size(); ++i) {
            if (h_used[i]) continue;
            int best_j = -1;
            long best_dist = -1;
            for (size_t j = 0; j < ref.size(); ++j) {
                if (r_used[j]) continue;
                bool ok = stage == 0 ? hyp[i] == ref[j] : hyp_stem[i] == ref_stem[j];
                if (!ok) continue;
                long dist = std::labs(static_cast<long>(i) - static_cast<long>(j));
                if (best_dist < 0 || dist < best_dist) { best_dist = dist; best_j = static_cast<int>(j); }
            }
            if (best_j >= 0) {
                h_used[i] = true;
                r_used[best_j] = true;
                matches.push_back({static_cast<int>(i), best_j, stage});
            }
        }
    }
    return matches;
}

int count_chunks(std::vector<Match> matches) {
    if (matches.empty()) return 0;
    std::sort(matches.begin(), matches.end(), [](const Match& a, const Match& b) {
        return a.h != b.h ? a.h < b.h : a.r < b.r;
    });
    int chunks = 1;
    for (size_t k = 1; k < matches.size(); ++k) {
        if (!(matches[k].h == matches[k-1].h + 1 && matches[k].r == matches[k-1].r + 1))
            ++chunks;
    }
    return chunks;
}

double word_weight(const std::string& w) {
    return function_words().count(w) ? (1.0 - DELTA) : DELTA;
}

}  // namespace

extern "C" {

// out[6] = {matches, chunks, w_matched_h, w_matched_r, w_len_h, w_len_r}
void ccn_meteor_stats(const char* hyp_c, const char* ref_c, double* out) {
    auto hyp = split_ws(hyp_c ? hyp_c : "");
    auto ref = split_ws(ref_c ? ref_c : "");
    auto matches = align(hyp, ref);

    double w_h = 0.0, w_r = 0.0;
    for (auto& m : matches) {
        w_h += STAGE_WEIGHTS[m.stage] * word_weight(hyp[m.h]);
        w_r += STAGE_WEIGHTS[m.stage] * word_weight(ref[m.r]);
    }
    double len_h = 0.0, len_r = 0.0;
    for (auto& w : hyp) len_h += word_weight(w);
    for (auto& w : ref) len_r += word_weight(w);

    out[0] = static_cast<double>(matches.size());
    out[1] = static_cast<double>(count_chunks(matches));
    out[2] = w_h;
    out[3] = w_r;
    out[4] = len_h;
    out[5] = len_r;
}

double ccn_meteor_score_from_stats(const double* st) {
    double matches = st[0], chunks = st[1];
    double w_h = st[2], w_r = st[3], len_h = st[4], len_r = st[5];
    if (matches == 0 || len_h == 0 || len_r == 0) return 0.0;
    double p = w_h / len_h, r = w_r / len_r;
    if (p == 0 || r == 0) return 0.0;
    double fmean = (p * r) / (ALPHA * p + (1 - ALPHA) * r);
    double penalty = 0.0;
    if (matches > 1) penalty = GAMMA * std::pow(chunks / matches, BETA);
    return (1.0 - penalty) * fmean;
}

// Porter stemmer exposed for cross-testing against the Python spec.
char* ccn_porter_stem(const char* word) {
    std::string out = clipcap_native::porter_stem(word ? word : "");
    char* p = static_cast<char*>(std::malloc(out.size() + 1));
    std::memcpy(p, out.c_str(), out.size() + 1);
    return p;
}

}  // extern "C"

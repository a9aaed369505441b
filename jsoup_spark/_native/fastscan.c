/* fastscan — optional C accelerator for the tokenizer's Data-state fast
 * path (jsoup_spark/parser/tokenizer.py _data batching loop).
 *
 * Scope (strict subset of the Python fast path, which remains the source
 * of truth and the fallback):
 *   - text segments up to the next '&', '<', NUL or EOF
 *   - attr-less start tags  <name[ws]*[/]?>   (name = [a-zA-Z][a-zA-Z0-9:._-]*)
 *   - end tags              </name[ws]*>
 * Anything else (tags with attributes, entities, markup declarations)
 * bails back to the Python machinery at exactly the position the state
 * machine expects. Emitted tokens are plain attribute-bearing objects
 * (FastToken) consumed by the tree builder through the same `.type`
 * dispatch as the Python token classes.
 *
 * Semantics mirrored from the Python batch loop:
 *   - text is committed only when the tag that FOLLOWS it parses fast
 *   - batching stops after state-switching tags (_BATCH_STOP set, shared
 *     with Python), after self-closing tags, and at a 48-token cap
 *   - markup_start ends at the last emitted tag's '<' (RCDATA staleness)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <structmember.h>

/* token type codes — must match jsoup_spark.parser.tokenizer T_* */
#define TOK_START 1
#define TOK_END 2
#define TOK_CHAR 4

typedef struct {
    PyObject_HEAD
    int type;
    PyObject *name;        /* original case (tags) or NULL */
    PyObject *normal;      /* interned lowercase (tags) or NULL */
    PyObject *attrs;       /* always None here */
    PyObject *attr_ranges; /* always None */
    PyObject *data;        /* Character text or NULL */
    int self_closing;
    Py_ssize_t start_pos;
    Py_ssize_t end_pos;
} FastToken;

static void
FastToken_dealloc(FastToken *self)
{
    Py_XDECREF(self->name);
    Py_XDECREF(self->normal);
    Py_XDECREF(self->attrs);
    Py_XDECREF(self->attr_ranges);
    Py_XDECREF(self->data);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static PyMemberDef FastToken_members[] = {
    {"type", T_INT, offsetof(FastToken, type), READONLY, NULL},
    {"name", T_OBJECT, offsetof(FastToken, name), 0, NULL},
    {"normal", T_OBJECT, offsetof(FastToken, normal), 0, NULL},
    {"attrs", T_OBJECT, offsetof(FastToken, attrs), 0, NULL},
    {"attr_ranges", T_OBJECT, offsetof(FastToken, attr_ranges), 0, NULL},
    {"data", T_OBJECT, offsetof(FastToken, data), 0, NULL},
    {"self_closing", T_INT, offsetof(FastToken, self_closing), 0, NULL},
    {"start_pos", T_PYSSIZET, offsetof(FastToken, start_pos), 0, NULL},
    {"end_pos", T_PYSSIZET, offsetof(FastToken, end_pos), 0, NULL},
    {NULL}
};

static PyTypeObject FastTokenType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "jsoup_fastscan.FastToken",
    .tp_basicsize = sizeof(FastToken),
    .tp_dealloc = (destructor)FastToken_dealloc,
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_members = FastToken_members,
    .tp_new = PyType_GenericNew,
};

/* module state: interned-normal cache, batching stop set, and the
 * Python attr-value charref decoder (_decode_attr_value) used for quoted
 * values containing '&' — called only AFTER the tag's '>' confirms, so a
 * bail never emits errors (same deferred-decode rule as the Python path) */
static PyObject *g_normal_cache = NULL; /* dict: name -> interned normal */
static PyObject *g_stop_set = NULL;     /* frozenset of normals */
static PyObject *g_decode = NULL;       /* _decode_attr_value */

static PyObject *
configure(PyObject *self, PyObject *args)
{
    PyObject *stop, *decode;
    if (!PyArg_ParseTuple(args, "OO", &stop, &decode))
        return NULL;
    Py_XDECREF(g_stop_set);
    Py_INCREF(stop);
    g_stop_set = stop;
    Py_XDECREF(g_decode);
    Py_INCREF(decode);
    g_decode = decode;
    if (g_normal_cache == NULL)
        g_normal_cache = PyDict_New();
    Py_RETURN_NONE;
}

static inline int is_alpha(Py_UCS4 c)
{
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}

static inline int is_name_char(Py_UCS4 c)
{
    return is_alpha(c) || (c >= '0' && c <= '9') || c == ':' || c == '.' ||
           c == '_' || c == '-';
}

static inline int is_tag_ws(Py_UCS4 c)
{
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f';
}

static inline int is_attr_name_char(Py_UCS4 c)
{
    /* mirrors the Python fast path's attr-name class:
       [^\x00-\x20/=>"'<]+ */
    return c > 0x20 && c != '/' && c != '=' && c != '>' && c != '"' &&
           c != '\'' && c != '<';
}

static FastToken *
make_token(int type, PyObject *name, PyObject *normal, int self_closing,
           Py_ssize_t start, Py_ssize_t end, PyObject *attrs)
{
    FastToken *tok = PyObject_New(FastToken, &FastTokenType);
    if (tok == NULL)
        return NULL;
    tok->type = type;
    Py_XINCREF(name);
    tok->name = name;
    Py_XINCREF(normal);
    tok->normal = normal;
    if (attrs == NULL)
        attrs = Py_None;
    Py_INCREF(attrs);
    tok->attrs = attrs;
    Py_INCREF(Py_None);
    tok->attr_ranges = Py_None;
    tok->data = NULL;
    tok->self_closing = self_closing;
    tok->start_pos = start;
    tok->end_pos = end;
    return tok;
}

/* normal-for-name: cached interned ASCII lowercase */
static PyObject *
normal_for(PyObject *name)
{
    PyObject *normal = PyDict_GetItem(g_normal_cache, name); /* borrowed */
    if (normal != NULL) {
        Py_INCREF(normal);
        return normal;
    }
    normal = PyObject_CallMethod(name, "lower", NULL);
    if (normal == NULL)
        return NULL;
    PyUnicode_InternInPlace(&normal);
    if (PyDict_Size(g_normal_cache) < 8192)
        PyDict_SetItem(g_normal_cache, name, normal);
    return normal;
}

/* scan(s, pos) -> (tokens, end_pos, markup_start, last_start or None)
 * tokens == empty list means "nothing handled; use the Python path". */
static PyObject *
scan(PyObject *self, PyObject *args)
{
    PyObject *s, *errors;
    Py_ssize_t pos;
    if (!PyArg_ParseTuple(args, "UnO", &s, &pos, &errors))
        return NULL;

    const int kind = PyUnicode_KIND(s);
    const void *data = PyUnicode_DATA(s);
    const Py_ssize_t n = PyUnicode_GET_LENGTH(s);

    PyObject *tokens = PyList_New(0);
    if (tokens == NULL)
        return NULL;

    Py_ssize_t end2 = pos;      /* '<' of the candidate tag */
    Py_ssize_t p2 = pos;        /* start of the uncommitted text segment */
    Py_ssize_t markup_start = -1;
    PyObject *last_start = NULL; /* borrowed-ish: we own a ref */
    int count = 0;
    int stop = 0;

    while (!stop) {
        /* --- probe a fast tag at end2 (s[end2] == '<') --- */
        Py_ssize_t i = end2 + 1;
        int is_end = 0;
        if (i < n && PyUnicode_READ(kind, data, i) == '/') {
            is_end = 1;
            i++;
        }
        if (i >= n || !is_alpha(PyUnicode_READ(kind, data, i)))
            break; /* not a letter-led tag: Python path */
        Py_ssize_t name_start = i;
        i++;
        while (i < n && is_name_char(PyUnicode_READ(kind, data, i)))
            i++;
        Py_ssize_t name_end = i;
        /* --- attributes (start tags only; mirrors _fast_attr_tag's
         * grammar; any '&' in a value, NUL, or error char bails the whole
         * tag to Python, which also owns charref decoding) --- */
        PyObject *attrs = NULL;
        Py_ssize_t pend_idx[64];
        Py_ssize_t pend_vs[64], pend_ve[64];
        int n_pending = 0;
        if (!is_end) {
            while (1) {
                Py_ssize_t w = i;
                while (w < n && is_tag_ws(PyUnicode_READ(kind, data, w)))
                    w++;
                if (w == i || w >= n)
                    break; /* no separator: tail must follow */
                Py_UCS4 c0 = PyUnicode_READ(kind, data, w);
                if (!is_attr_name_char(c0))
                    break; /* '/' or '>' or error char: tail decides */
                Py_ssize_t an_start = w;
                while (w < n &&
                       is_attr_name_char(PyUnicode_READ(kind, data, w)))
                    w++;
                Py_ssize_t an_end = w;
                /* optional  ws* '=' ws* value */
                Py_ssize_t v = w;
                while (v < n && is_tag_ws(PyUnicode_READ(kind, data, v)))
                    v++;
                PyObject *val = NULL;
                int have_val = 0;
                if (v < n && PyUnicode_READ(kind, data, v) == '=') {
                    v++;
                    while (v < n &&
                           is_tag_ws(PyUnicode_READ(kind, data, v)))
                        v++;
                    if (v >= n)
                        goto attr_fail;
                    Py_UCS4 q = PyUnicode_READ(kind, data, v);
                    if (q == '"' || q == '\'') {
                        Py_ssize_t vs = v + 1, ve = vs;
                        Py_UCS4 cc = 0;
                        int amp = 0;
                        while (ve < n) {
                            cc = PyUnicode_READ(kind, data, ve);
                            if (cc == q || cc == 0)
                                break;
                            if (cc == '&')
                                amp = 1;
                            ve++;
                        }
                        if (ve >= n || cc != q)
                            goto attr_fail; /* NUL or unterminated */
                        if (amp) {
                            /* defer charref decode until '>' confirms;
                             * registered after a successful append below */
                            if (n_pending >= 64)
                                goto attr_fail;
                            pend_vs[n_pending] = vs;
                            pend_ve[n_pending] = ve;
                            val = NULL;
                            have_val = 2; /* pending marker */
                        } else {
                            val = PyUnicode_Substring(s, vs, ve);
                            if (val == NULL) {
                                Py_XDECREF(attrs);
                                goto fail;
                            }
                            have_val = 1;
                        }
                        w = ve + 1;
                    } else {
                        Py_ssize_t vs = v, ve = v;
                        while (ve < n) {
                            Py_UCS4 cc = PyUnicode_READ(kind, data, ve);
                            if (cc == 0 || is_tag_ws(cc) || cc == '>' ||
                                cc == '"' || cc == '\'' || cc == '<' ||
                                cc == '=' || cc == '`' || cc == '&')
                                break;
                            ve++;
                        }
                        if (ve == vs)
                            goto attr_fail; /* empty / error-led value */
                        if (ve < n) {
                            Py_UCS4 cc = PyUnicode_READ(kind, data, ve);
                            if (cc == '"' || cc == '\'' || cc == '<' ||
                                cc == '=' || cc == '`' || cc == '&' ||
                                cc == 0)
                                goto attr_fail; /* error char ends value */
                        }
                        val = PyUnicode_Substring(s, vs, ve);
                        if (val == NULL) {
                            Py_XDECREF(attrs);
                            goto fail;
                        }
                        have_val = 1;
                        w = ve;
                    }
                }
                if (attrs == NULL) {
                    attrs = PyList_New(0);
                    if (attrs == NULL)
                        goto fail;
                }
                if (PyList_Size(attrs) < 512) {
                    PyObject *aname = PyUnicode_Substring(s, an_start, an_end);
                    if (aname == NULL) {
                        Py_XDECREF(val);
                        Py_XDECREF(attrs);
                        goto fail;
                    }
                    PyObject *pair = PyTuple_Pack(
                        2, aname, have_val == 1 ? val : Py_None);
                    Py_DECREF(aname);
                    Py_XDECREF(val);
                    if (pair == NULL) {
                        Py_XDECREF(attrs);
                        goto fail;
                    }
                    if (PyList_Append(attrs, pair) < 0) {
                        Py_DECREF(pair);
                        Py_XDECREF(attrs);
                        goto fail;
                    }
                    Py_DECREF(pair);
                    if (have_val == 2) {
                        pend_idx[n_pending] = PyList_Size(attrs) - 1;
                        n_pending++;
                    }
                } else {
                    Py_XDECREF(val);
                }
                i = w;
                continue;
            attr_fail:
                Py_XDECREF(attrs);
                goto bail;
            }
        }
        while (i < n && is_tag_ws(PyUnicode_READ(kind, data, i)))
            i++;
        int self_closing = 0;
        if (!is_end && i < n && PyUnicode_READ(kind, data, i) == '/') {
            self_closing = 1;
            i++;
        }
        if (i >= n || PyUnicode_READ(kind, data, i) != '>') {
            Py_XDECREF(attrs);
            break; /* malformed / EOF: Python path */
        }
        Py_ssize_t tend = i + 1;
        /* tag confirmed: decode any deferred &-bearing quoted values */
        for (int pi = 0; pi < n_pending; pi++) {
            PyObject *decoded = PyObject_CallFunction(
                g_decode, "OnnO", s, pend_vs[pi], pend_ve[pi], errors);
            if (decoded == NULL) {
                Py_XDECREF(attrs);
                goto fail;
            }
            PyObject *old = PyList_GetItem(attrs, pend_idx[pi]); /* borrowed */
            PyObject *pair = PyTuple_Pack(
                2, PyTuple_GET_ITEM(old, 0), decoded);
            Py_DECREF(decoded);
            if (pair == NULL) {
                Py_XDECREF(attrs);
                goto fail;
            }
            PyList_SetItem(attrs, pend_idx[pi], pair); /* steals */
        }

        /* --- commit: text segment [p2, end2), then the tag --- */
        if (end2 > p2) {
            PyObject *text = PyUnicode_Substring(s, p2, end2);
            if (text == NULL)
                goto fail;
            FastToken *ct = make_token(TOK_CHAR, NULL, NULL, 0, p2, end2, NULL);
            if (ct == NULL) {
                Py_DECREF(text);
                goto fail;
            }
            ct->data = text; /* steal */
            if (PyList_Append(tokens, (PyObject *)ct) < 0) {
                Py_DECREF(ct);
                goto fail;
            }
            Py_DECREF(ct);
        }
        PyObject *name = PyUnicode_Substring(s, name_start, name_end);
        if (name == NULL)
            goto fail;
        PyObject *normal = normal_for(name);
        if (normal == NULL) {
            Py_DECREF(name);
            goto fail;
        }
        FastToken *tok = make_token(is_end ? TOK_END : TOK_START, name, normal,
                                    self_closing, end2, tend, attrs);
        Py_XDECREF(attrs);
        Py_DECREF(name);
        if (tok == NULL) {
            Py_DECREF(normal);
            goto fail;
        }
        if (PyList_Append(tokens, (PyObject *)tok) < 0) {
            Py_DECREF(normal);
            Py_DECREF(tok);
            goto fail;
        }
        Py_DECREF(tok);
        markup_start = end2;
        count++;
        if (!is_end) {
            Py_XDECREF(last_start);
            Py_INCREF(normal);
            last_start = normal;
            if (self_closing ||
                PySet_Contains(g_stop_set, normal) == 1)
                stop = 1;
        }
        Py_DECREF(normal);
        p2 = tend;
        end2 = tend;
        if (count >= 48)
            stop = 1;
        if (stop)
            break;

        /* --- advance over plain text to the next '<' --- */
        Py_ssize_t j = p2;
        Py_UCS4 c = 0;
        while (j < n) {
            c = PyUnicode_READ(kind, data, j);
            if (c == '<' || c == '&' || c == 0)
                break;
            j++;
        }
        if (j >= n || c != '<') {
            /* EOF / entity / NUL: leave trailing text to Python */
            break;
        }
        end2 = j;
    }

bail:
    {
        /* end_pos = after the last committed tag (p2 latches to tend) */
        PyObject *ls = last_start ? last_start : Py_None;
        PyObject *res = Py_BuildValue("(OnnO)", tokens, p2, markup_start, ls);
        Py_XDECREF(last_start);
        Py_DECREF(tokens);
        return res;
    }

fail:
    Py_XDECREF(last_start);
    Py_DECREF(tokens);
    return NULL;
}

static PyMethodDef methods[] = {
    {"scan", scan, METH_VARARGS, "scan Data-state input from a '<'"},
    {"configure", configure, METH_VARARGS, "set the batch stop set"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "jsoup_fastscan", NULL, -1, methods,
};

PyMODINIT_FUNC
PyInit_jsoup_fastscan(void)
{
    PyObject *m;
    if (PyType_Ready(&FastTokenType) < 0)
        return NULL;
    m = PyModule_Create(&moduledef);
    if (m == NULL)
        return NULL;
    Py_INCREF(&FastTokenType);
    PyModule_AddObject(m, "FastToken", (PyObject *)&FastTokenType);
    return m;
}

// Conformance oracle: runs the reference jsonld.js on a JSON request.
// Usage: node oracle.js <request.json>   → writes JSON result to stdout
// request: {op: expand|flatten|toRDF|compact|fromRDF|merge, input, context?, options?}
// batch:   {op: "batch", requests: [request, ...]} → {ok, results: [...]}
const util = require('/root/reference/lib/util.js');
// The fork comments out rdf-canonize's IdentifierIssuer; restore the public contract.
class IdentifierIssuer {
  constructor(prefix) { this.prefix = prefix; this.counter = 0; this.existing = new Map(); }
  getId(old) {
    if (old && this.existing.has(old)) return this.existing.get(old);
    const id = this.prefix + (this.counter++);
    if (old) this.existing.set(old, id);
    return id;
  }
  hasId(old) { return this.existing.has(old); }
  clone() { const c = new IdentifierIssuer(this.prefix); c.counter = this.counter; c.existing = new Map(this.existing); return c; }
  getOldIds() { return [...this.existing.keys()]; }
}
util.IdentifierIssuer = IdentifierIssuer;
// lib/jsonld.js:800,806 reference the bare (commented-out) module const —
// an unqualified identifier resolves via globalThis at runtime.
globalThis.IdentifierIssuer = IdentifierIssuer;
const jsonld = require('/root/reference/lib/index.js');
const fs = require('fs');

function termToJson(t) {
  const o = {termType: t.termType, value: t.value};
  if (t.termType === 'Literal') {
    o.datatype = t.datatype ? t.datatype.value : null;
    o.language = t.language || null;
  }
  return o;
}

const ContextResolver = require('/root/reference/lib/ContextResolver.js');

async function runOne(req) {
  const opts = Object.assign({documentLoader: async url => {
    if (req.documents && req.documents[url]) {
      return {contextUrl: null, documentUrl: url, document: req.documents[url]};
    }
    throw new Error('loading document failed: ' + url);
  }}, req.options || {});
  // isolate requests from the module-level shared resolved-context
  // cache — batch mode must not leak @import processed state across
  // requests (lib/jsonld.js:86-89 cache is process-global)
  opts.contextResolver = new ContextResolver({sharedCache: new Map()});
  try {
    let result;
    if (req.op === 'expandEvents') {
      // capture the expansionMap event stream (lib/jsonld.js:109-117);
      // events are normalized to JSON-safe records. NOTE the lone-
      // @language site calls expansionMap(rval, info) (lib/expand.js:352)
      // — there `info` IS rval, hence the `in` fallback.
      const events = [];
      opts.expansionMap = info => {
        if (info.unmappedProperty !== undefined) {
          events.push({kind: 'unmappedProperty', key: info.unmappedProperty});
        } else if (info.relativeIri !== undefined) {
          events.push({kind: 'relativeIri', value: info.relativeIri,
                       typeExpansion: !!info.typeExpansion});
        } else if (info.prependedIri !== undefined) {
          const p = info.prependedIri;
          const rawPrefix = p.type === '@vocab' ? p.vocab : p.base;
          events.push({kind: 'prependedIri', type: p.type,
                       prefix: rawPrefix == null ? '' : rawPrefix,
                       value: p.value, typeExpansion: !!p.typeExpansion,
                       result: p.result});
        } else {
          const v = ('unmappedValue' in info) ? info.unmappedValue : info;
          events.push({kind: 'unmappedValue',
                       value: v === undefined ? null : v});
        }
        return undefined;
      };
      const expanded = await jsonld.expand(req.input, opts);
      result = {expanded, events};
    }
    else if (req.op === 'expand') result = await jsonld.expand(req.input, opts);
    else if (req.op === 'flatten') result = await jsonld.flatten(req.input, req.context || null, opts);
    else if (req.op === 'compact') result = await jsonld.compact(req.input, req.context, opts);
    else if (req.op === 'merge') result = await jsonld.merge(req.input, req.context || null, opts);
    else if (req.op === 'frame') result = await jsonld.frame(req.input, req.frame, opts);
    else if (req.op === 'link') result = await jsonld.link(req.input, req.context || null, opts);
    else if (req.op === 'fromRDF') {
      result = await jsonld.fromRDF(req.input, opts); // input: dataset array
    } else if (req.op === 'toRDF') {
      const ds = await jsonld.toRDF(req.input, opts);
      result = ds.map(q => ({
        subject: termToJson(q.subject), predicate: termToJson(q.predicate),
        object: termToJson(q.object), graph: termToJson(q.graph),
      }));
    } else throw new Error('bad op ' + req.op);
    return {ok: true, result};
  } catch (e) {
    return {ok: false, error: e.message, code: (e.details && e.details.code) || e.code || null};
  }
}

async function main() {
  const req = JSON.parse(fs.readFileSync(process.argv[2], 'utf8'));
  if (req.op === 'batch') {
    const results = [];
    for (const sub of req.requests) {
      results.push(await runOne(sub));
    }
    process.stdout.write(JSON.stringify({ok: true, results}));
  } else {
    process.stdout.write(JSON.stringify(await runOne(req)));
  }
}
main();

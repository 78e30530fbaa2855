// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

/// @notice Minimal proof-gateway interface the VectorX contract consumes.
///
/// The reference delegates proof verification to its platform gateway
/// (`ISuccinctGateway.requestCall` / `verifiedCall`,
/// /root/reference/contracts/src/VectorX.sol:202,259). Our framework keeps
/// the same request/fulfil split but behind this neutral two-method
/// interface, so any verifier backend (an on-chain STARK/FRI verifier for
/// vectorx_tpu proofs, or a wrapping SNARK verifier) can be plugged in:
///
///  - requestCall: record a request for `functionId` on `input`, asking the
///    gateway to eventually call back `entryCalldata` on `callbackContract`.
///  - verifiedCall: synchronously return the proven output for
///    (functionId, input); MUST revert unless a valid proof for exactly
///    this pair has been fulfilled.
interface IProofGateway {
    function requestCall(
        bytes32 functionId,
        bytes memory input,
        address callbackContract,
        bytes memory entryCalldata,
        uint32 callbackGasLimit
    ) external payable;

    function verifiedCall(bytes32 functionId, bytes memory input)
        external
        view
        returns (bytes memory output);
}

// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

/// @notice Events, errors and data-query surface of the VectorX light client.
///
/// External surface parity with the reference bridge contract
/// (/root/reference/contracts/src/interfaces/IVectorX.sol): consumers index
/// the same events and read the same mappings; the range-commitment key is
/// keccak256(abi.encode(uint32 startBlock, uint32 endBlock)) — mirrored
/// host-side by vectorx_tpu.circuits.abi.range_commitment_key.
interface IVectorX {
    /// @notice A header-range proof was requested (inputs echo the 80-byte
    ///         request ABI: circuits.abi.HeaderRangeInput).
    event HeaderRangeRequested(
        uint32 trustedBlock,
        bytes32 trustedHeader,
        uint64 authoritySetId,
        bytes32 authoritySetHash,
        uint32 targetBlock
    );

    /// @notice A rotate proof was requested (40-byte request ABI:
    ///         circuits.abi.RotateInput).
    event RotateRequested(
        uint64 currentAuthoritySetId,
        bytes32 currentAuthoritySetHash
    );

    /// @notice The light-client head advanced.
    event HeadUpdate(uint32 blockNumber, bytes32 headerHash);

    /// @notice Merkle commitments over (trustedBlock, targetBlock] stored.
    event HeaderRangeCommitmentStored(
        uint32 startBlock,
        uint32 endBlock,
        bytes32 dataCommitment,
        bytes32 stateCommitment,
        uint32 headerRangeCommitmentTreeSize
    );

    /// @notice A new authority set hash became known to the contract.
    event AuthoritySetStored(uint64 authoritySetId, bytes32 authoritySetHash);

    error NextAuthoritySetExists();
    error ContractFrozen();
    error TrustedHeaderNotFound();
    error AuthoritySetNotFound();
    error OldAuthoritySetId();

    function latestBlock() external view returns (uint32);

    function latestAuthoritySetId() external view returns (uint64);

    function blockHeightToHeaderHash(uint32 height) external view returns (bytes32);

    function authoritySetIdToHash(uint64 id) external view returns (bytes32);

    function dataRootCommitments(bytes32 rangeKey) external view returns (bytes32);

    function stateRootCommitments(bytes32 rangeKey) external view returns (bytes32);

    function rangeStartBlocks(bytes32 rangeKey) external view returns (uint32);
}
